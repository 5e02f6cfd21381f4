"""Hub-replicated partition parallelism (VERDICT r3 #3).

Power-law graphs defeat edge-cut partitioners (0.74 cut on the 20k BA
bench vs random's 0.94); the standard fix is replicating the few
highest-degree hubs every layer. Covered here:

* partition_graph_hubs quality: effective cut on a preferential-
  attachment graph drops below 0.5 (the round-4 target) while balance
  holds.
* partition_spmm_hub parity: on an 8-device mesh the hub-replicated
  exchange reproduces the single-device SpMM and the dense-gather
  strategy exactly, including gradients.
* halo traffic: the hub strategy ships fewer bytes than the plain
  sparse halo on a power-law graph.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.loader.cluster import (
    edge_cut, effective_edge_cut, partition_graph, partition_graph_hubs,
    select_hubs)


def _power_law(rng, n=4000, m=6):
    """Preferential attachment (repeated-endpoint trick)."""
    src, dst, rep = [], [], list(range(m))
    for v in range(m, n):
        picks = rng.integers(0, len(rep), m)
        for pk in picks:
            u = rep[pk]
            src.append(v)
            dst.append(u)
            rep += [u, v]
    return np.stack([np.array(src), np.array(dst)]).astype(np.int64)


def test_hub_partition_quality():
    rng = np.random.default_rng(0)
    coo = _power_law(rng)
    n = 4000
    base = partition_graph(coo, n, 8)
    base_cut = edge_cut(coo, base)
    parts, hub = partition_graph_hubs(coo, n, 8, hub_frac=0.05)
    eff = effective_edge_cut(coo, parts, hub)
    assert eff < 0.5, f'effective cut {eff} (target < 0.5)'
    assert eff < base_cut - 0.1
    # balance holds despite hub reassignment
    counts = np.bincount(parts, minlength=8)
    assert counts.max() <= 1.06 * n / 8 + 1
    # every node assigned, hubs are the top-degree ones
    deg = np.bincount(coo[0], minlength=n) + np.bincount(coo[1],
                                                         minlength=n)
    assert deg[hub].min() >= np.percentile(deg[~hub], 99) * 0.5


def test_select_hubs_threshold():
    coo = np.array([[0, 0, 0, 1, 2], [1, 2, 3, 2, 3]])
    mask = select_hubs(coo, 4, hub_threshold=2)
    assert mask[0] and not mask[1]


def _hub_parts(n=96, e=768, f=8, P_=8, seed=0, hub_frac=0.05):
    from pytorch_geometric_tpu.parallel import Partitioner
    rng = np.random.default_rng(seed)
    # skewed srcs so real hubs exist
    src = (n * rng.random(e) ** 3).astype(np.int64)
    dst = rng.integers(0, n, e)
    coo = np.stack([src, dst])
    w = rng.random(e).astype(np.float32)
    data = Data(x=rng.standard_normal((n, f)).astype(np.float32),
                edge_index=coo.astype(np.int32), edge_weight=w,
                num_nodes=n)
    parts = Partitioner(data, P_,
                        hub_frac=hub_frac).generate_partition()
    return parts, coo, w, data


@pytest.mark.skipif(len(jax.devices('cpu')) < 8,
                    reason='needs the 8-device virtual mesh')
def test_hub_spmm_matches_single_device():
    from pytorch_geometric_tpu.parallel import (partition_spmm,
                                                partition_spmm_hub)
    parts, coo, w, data = _hub_parts()
    assert parts.hub_local is not None
    assert parts.hub_local_mask.sum() > 0
    n, f = data.num_nodes, data.x.shape[1]
    P_, n_max = parts.num_parts, parts.n_max
    mesh = Mesh(np.array(jax.devices('cpu')[:P_]), ('graph',))
    x_sh = jnp.asarray(np.asarray(parts.x))

    def hub_body(x_own, hs, hm, hl, hlm, es, ed, em, ew, asr, asl, am,
                 aw):
        return partition_spmm_hub(x_own[0], hs[0], hm[0], hl[0],
                                  hlm[0], es[0], ed[0], em[0], ew[0],
                                  asr[0], asl[0], am[0], aw[0])[None]

    hub_fn = jax.shard_map(
        hub_body, mesh=mesh, in_specs=(P('graph'),) * 13,
        out_specs=P('graph'), check_vma=False)
    args = (x_sh, jnp.asarray(parts.halo_send),
            jnp.asarray(parts.halo_send_mask),
            jnp.asarray(parts.hub_local),
            jnp.asarray(parts.hub_local_mask),
            jnp.asarray(parts.edge_src_hub),
            jnp.asarray(parts.edge_dst_hub),
            jnp.asarray(parts.edge_mask_hub),
            jnp.asarray(parts.edge_weight_hub),
            jnp.asarray(parts.agg_src), jnp.asarray(parts.agg_slot),
            jnp.asarray(parts.agg_mask),
            jnp.asarray(parts.agg_weight))
    out_hub = np.asarray(hub_fn(*args))

    # dense-gather strategy on the same partitioning
    def dense_body(x_own, es, ed, em, ew):
        return partition_spmm(x_own[0], es[0], ed[0], em[0], ew[0])[None]

    dense_fn = jax.shard_map(
        dense_body, mesh=mesh, in_specs=(P('graph'),) * 5,
        out_specs=P('graph'), check_vma=False)
    out_dense = np.asarray(dense_fn(
        x_sh, jnp.asarray(parts.edge_src), jnp.asarray(parts.edge_dst),
        jnp.asarray(parts.edge_mask), jnp.asarray(parts.edge_weight)))
    np.testing.assert_allclose(out_hub, out_dense, rtol=1e-5, atol=1e-5)

    # single-device reference scattered into partition layout
    x = np.asarray(data.x)
    ref = np.zeros((n, f), np.float32)
    np.add.at(ref, coo[1], x[coo[0]] * w[:, None])
    ref_parts = np.zeros((P_, n_max, f), np.float32)
    own, own_mask = np.asarray(parts.own), np.asarray(parts.own_mask)
    for p in range(P_):
        ref_parts[p][own_mask[p]] = ref[own[p][own_mask[p]]]
    np.testing.assert_allclose(out_hub, ref_parts, rtol=1e-5, atol=1e-5)

    # gradient parity: d/dx of sum(out) — hub vs dense gather
    def loss_hub(x_sh):
        return hub_fn(x_sh, *args[1:]).sum()

    def loss_dense(x_sh):
        return dense_fn(x_sh, jnp.asarray(parts.edge_src),
                        jnp.asarray(parts.edge_dst),
                        jnp.asarray(parts.edge_mask),
                        jnp.asarray(parts.edge_weight)).sum()

    g_hub = np.asarray(jax.grad(loss_hub)(x_sh))
    g_dense = np.asarray(jax.grad(loss_dense)(x_sh))
    np.testing.assert_allclose(g_hub, g_dense, rtol=1e-5, atol=1e-5)


def test_hub_strategy_ships_fewer_bytes():
    from pytorch_geometric_tpu.parallel import Partitioner
    rng = np.random.default_rng(1)
    half = _power_law(rng, n=2000, m=6)
    coo = np.concatenate([half, half[::-1]], 1)   # undirected
    w = np.ones(coo.shape[1], np.float32)
    data = Data(x=rng.standard_normal((2000, 4)).astype(np.float32),
                edge_index=coo.astype(np.int32), edge_weight=w,
                num_nodes=2000)
    plain = Partitioner(data, 8).generate_partition()
    hub = Partitioner(data, 8, hub_frac=0.05).generate_partition()
    assert hub.halo_bytes(64) < plain.halo_bytes(64)
    # padded all_to_all buffer shrinks too (hubs no longer inflate the
    # max pair boundary)
    assert hub.h_max <= plain.h_max
