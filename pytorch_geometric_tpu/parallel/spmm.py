"""Partition-parallel message passing over a device mesh.

The TPU replacement for the reference's pull-based RPC sampling + halo
merge (``distributed/dist_neighbor_sampler.py:875-947``): graph
partitions live on devices along a ``graph`` mesh axis.

Two exchange strategies:

* **sparse halo** (default, :func:`partition_spmm_halo`) — the
  Partitioner precomputes per-pair boundary index sets; each layer ships
  ONLY boundary features via one ``all_to_all`` over ICI
  (O(boundary * F) traffic), then reduces local edges against the
  ``[own | recv]`` buffer. The backward is the transposed
  ``all_to_all`` — the mirrored halo-gradient exchange — for free via
  shard_map differentiation.
* **dense gather** (:func:`partition_spmm`) — all-gathers every owned
  block (O(N * F) replicated traffic); kept as the fallback for
  partitions built without halo sets.

The boundary ``x_own[halo_send]`` gather and the local-edge aggregation
are independent of the collective's in-flight bytes, so XLA's async
collectives overlap them with compute where profitable.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def partition_spmm(x_own: jnp.ndarray, edge_src: jnp.ndarray,
                   edge_dst: jnp.ndarray, edge_mask: jnp.ndarray,
                   edge_weight: Optional[jnp.ndarray],
                   axis_name: str = 'graph') -> jnp.ndarray:
    """One partition-parallel A^T x (dst-owned). Call INSIDE shard_map.

    x_own:    [n_max, F] this device's owned features
    edge_src: [e_max] src position in the gathered buffer
    edge_dst: [e_max] local dst position (n_max = dump row)
    """
    n_max = x_own.shape[0]
    # Halo exchange: gather every partition's owned block over ICI.
    x_full = jax.lax.all_gather(x_own, axis_name, tiled=True)  # [P*n, F]
    src = jnp.minimum(edge_src, x_full.shape[0] - 1)
    msg = x_full[src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    dst = jnp.where(edge_mask, edge_dst, n_max)
    return jax.ops.segment_sum(msg, dst, n_max + 1)[:n_max]


def partition_spmm_halo(x_own: jnp.ndarray, halo_send: jnp.ndarray,
                        halo_send_mask: jnp.ndarray,
                        edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
                        edge_mask: jnp.ndarray,
                        edge_weight: Optional[jnp.ndarray],
                        axis_name: str = 'graph') -> jnp.ndarray:
    """Sparse-halo A^T x (dst-owned). Call INSIDE shard_map.

    x_own:          [n_max, F] this device's owned features
    halo_send:      [P, h_max] local positions to ship to each peer
    halo_send_mask: [P, h_max]
    edge_src:       [e_max] position in the [own | recv] buffer
    edge_dst:       [e_max] local dst position
    """
    n_max, f = x_own.shape
    num_p, h_max = halo_send.shape
    # Boundary gather (pad -> zero row), then ONE all_to_all: device q's
    # send[r] lands as this device's recv[q]; slot order was agreed at
    # partition time, so recv is directly addressable.
    x_pad = jnp.concatenate([x_own, jnp.zeros((1, f), x_own.dtype)])
    send = x_pad[jnp.minimum(halo_send, n_max)]          # [P, h, F]
    send = jnp.where(halo_send_mask[..., None], send, 0)
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)  # [P, h, F]
    buf = jnp.concatenate([x_own, recv.reshape(num_p * h_max, f),
                           jnp.zeros((1, f), x_own.dtype)])
    src = jnp.minimum(edge_src, buf.shape[0] - 1)
    msg = buf[src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    dst = jnp.where(edge_mask, edge_dst, n_max)
    return jax.ops.segment_sum(msg, dst, n_max + 1)[:n_max]


def partition_spmm_halo_bsr(x_own: jnp.ndarray, halo_send: jnp.ndarray,
                            halo_send_mask: jnp.ndarray,
                            bsr_leaves, edge_src: jnp.ndarray,
                            edge_dst: jnp.ndarray,
                            edge_mask: jnp.ndarray,
                            edge_weight: Optional[jnp.ndarray],
                            axis_name: str = 'graph') -> jnp.ndarray:
    """Sparse-halo A^T x with the LOCAL dense-block edges on the BSR
    MXU kernel (``ops/bsr_spmm.py``). Call INSIDE shard_map.

    bsr_leaves: (vals, rows, cols, first, t_vals, t_rows, t_cols,
    t_first) — this partition's local block adjacency + transpose
    (``Partitioner.generate_partition(local_bsr=True)``). ``edge_src``/
    ``edge_dst`` carry only the halo + residual edges.
    """
    from ..ops.bsr_spmm import BSR, bsr_spmm
    n_max = x_own.shape[0]
    (vals, rows, cols, first, t_vals, t_rows, t_cols,
     t_first) = bsr_leaves
    fwd = BSR(vals=vals, rows=rows, cols=cols, first=first)
    bwd = BSR(vals=t_vals, rows=t_rows, cols=t_cols, first=t_first)
    local = bsr_spmm(fwd, bwd, x_own, n_max, n_max,
                     vma=frozenset({axis_name}))
    tail = partition_spmm_halo(x_own, halo_send, halo_send_mask,
                               edge_src, edge_dst, edge_mask,
                               edge_weight, axis_name)
    return local + tail


def make_partition_gcn_step(mesh: Mesh, model_apply, tx,
                            axis_name: str = 'graph'):
    """Build a jitted partition-parallel train step.

    ``model_apply(params, shard) -> (loss_sum, weight_sum)`` runs on one
    partition shard inside shard_map and may call ``partition_spmm``.
    Parameters are replicated; the gradient all-reduce over the mesh is
    induced by psum on the loss.
    """
    from jax import shard_map
    import optax

    data_spec = P(axis_name)

    def loss_fn(params, shard):
        def body(params, *shard_leaves):
            loss_sum, weight = model_apply(params, shard_leaves)
            loss_sum = jax.lax.psum(loss_sum, axis_name)
            weight = jax.lax.psum(weight, axis_name)
            return loss_sum / jnp.maximum(weight, 1.0)

        leaves, treedef = jax.tree_util.tree_flatten(shard)
        # check_vma=False: Pallas interpret mode (CPU tests/dryrun)
        # cannot propagate varying-axis metadata through its
        # dynamic_slice lowering (jax suggests this workaround).
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(),) + tuple(data_spec
                                               for _ in leaves),
                       out_specs=P(), check_vma=False)
        return fn(params, *leaves)

    @jax.jit
    def train_step(params, opt_state, shard):
        loss, grads = jax.value_and_grad(loss_fn)(params, shard)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
