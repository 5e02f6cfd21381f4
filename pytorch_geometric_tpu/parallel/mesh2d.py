"""2-D mesh training: data parallelism x graph partitioning.

The GNN analog of DP x TP meshes: each ``data`` row of the mesh holds a
replica group processing its own minibatch of partitioned graphs; within
a replica the ``graph`` axis holds one partition per device (halo via
all_gather over ICI). Gradients all-reduce over BOTH axes (induced by
psum over ('data', 'graph')).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .models import (gcn_norm_weights, init_gcn_params,
                     partition_gcn_apply)
from .partition import Partitioner


def make_mesh2d(num_data: int, num_graph: int,
                devices=None) -> Mesh:
    devs = np.array(devices if devices is not None
                    else jax.devices()[:num_data * num_graph])
    return Mesh(devs.reshape(num_data, num_graph), ('data', 'graph'))


def train_2d(datas, num_graph_parts: int, mesh: Mesh,
             hidden: int = 16, num_steps: int = 3, lr: float = 1e-2,
             seed: int = 0):
    """Full 2-D training: ``datas`` is a list of graphs, one per 'data'
    row; each graph is partitioned over the 'graph' axis.

    Returns (params, losses).
    """
    from jax import shard_map
    num_data = mesh.devices.shape[0]
    assert len(datas) == num_data

    # partition every replica's graph; stack along a leading data axis
    n_max = e_max = h_max = 0
    parts_list = []
    for data in datas:
        coo = np.asarray(data.edge_index.coo
                         if hasattr(data.edge_index, 'coo')
                         else data.edge_index)
        n = data.num_nodes
        coo = np.concatenate(
            [coo, np.stack([np.arange(n), np.arange(n)])],
            axis=1).astype(np.int64)
        w = gcn_norm_weights(coo, n)
        d2 = data.replace(edge_index=coo.astype(np.int32),
                          edge_weight=w)
        parts = Partitioner(d2, num_graph_parts,
                            seed=seed).generate_partition()
        parts_list.append(parts)
        n_max = max(n_max, parts.n_max)
        e_max = max(e_max, parts.edge_src.shape[1])
        h_max = max(h_max, parts.h_max)

    def pad_to(a, n2, axis, fill=0):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, n2 - a.shape[axis])
        return np.pad(a, pad, constant_values=fill)

    F = parts_list[0].x.shape[-1]
    (xs, ys, oms, tms, srcs, dsts, ems, ews,
     hss, hms) = ([] for _ in range(10))
    for data, parts in zip(datas, parts_list):
        # re-pad each replica's partition arrays to the global maxima so
        # the stacked [D, G, ...] tensors are rectangular
        xs.append(pad_to(parts.x.astype(np.float32), n_max, 1))
        ys.append(pad_to(parts.y.astype(np.int32), n_max, 1))
        oms.append(pad_to(parts.own_mask, n_max, 1))
        # per-replica train mask, mapped into partition-local layout
        # (mirrors shard_partitions: train_mask[own] & own_mask)
        tm_full = (np.asarray(data.train_mask)
                   if getattr(data, 'train_mask', None) is not None
                   else np.ones(data.num_nodes, bool))
        tms.append(pad_to(tm_full[parts.own] & parts.own_mask, n_max, 1))
        # remap [own | recv]-buffer positions to the new n_max/h_max
        # strides: own positions are stride-free; recv slots re-encode
        n_o, h_o = parts.n_max, parts.h_max
        v = parts.edge_src_halo
        is_own = v < n_o
        q = np.minimum((v - n_o) // max(h_o, 1), num_graph_parts - 1)
        s = (v - n_o) % max(h_o, 1)
        is_pad = v >= n_o + num_graph_parts * h_o
        src2 = np.where(is_own, v, n_max + q * h_max + s)
        src2 = np.where(is_pad, n_max + num_graph_parts * h_max, src2)
        srcs.append(pad_to(src2, e_max, 1,
                           fill=n_max + num_graph_parts * h_max))
        dsts.append(pad_to(parts.edge_dst, e_max, 1, fill=n_max))
        ems.append(pad_to(parts.edge_mask, e_max, 1))
        ew = (parts.edge_weight if parts.edge_weight is not None
              else np.ones_like(parts.edge_src, np.float32))
        ews.append(pad_to(ew.astype(np.float32), e_max, 1))
        hs = np.where(parts.halo_send_mask, parts.halo_send, n_max)
        hss.append(pad_to(hs, h_max, 2, fill=n_max))
        hms.append(pad_to(parts.halo_send_mask, h_max, 2))

    leaves = tuple(np.stack(a) for a in
                   (xs, ys, oms, tms, srcs, dsts, ems, ews, hss, hms))
    spec = NamedSharding(mesh, P('data', 'graph'))
    leaves = tuple(jax.device_put(jnp.asarray(a), spec) for a in leaves)

    num_classes = int(max(np.asarray(d.y).max() for d in datas)) + 1
    params = init_gcn_params(jax.random.PRNGKey(seed), F, hidden,
                             num_classes)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(params, *ls):
        def body(params, *shard):
            # shard leaves arrive as [1, 1, ...] blocks
            loss_sum, weight = partition_gcn_apply(
                params, tuple(s[0] for s in shard))
            loss_sum = jax.lax.psum(loss_sum, ('data', 'graph'))
            weight = jax.lax.psum(weight, ('data', 'graph'))
            return loss_sum / jnp.maximum(weight, 1.0)

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(),) + tuple(P('data', 'graph')
                                               for _ in ls),
                       out_specs=P())
        return fn(params, *ls)

    @jax.jit
    def train_step(params, opt_state, *ls):
        loss, grads = jax.value_and_grad(loss_fn)(params, *ls)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    with mesh:
        for _ in range(num_steps):
            params, opt_state, loss = train_step(params, opt_state,
                                                 *leaves)
            losses.append(float(loss))
    return params, losses
