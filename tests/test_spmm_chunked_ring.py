"""Giant-E chunked SpMM (custom VJP) and ring-pipelined partition SpMM."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.ops import spmm
from pytorch_geometric_tpu.ops.spmm import _chunked_spmm


def test_chunked_matches_reference():
    N, E, F = 200, 5000, 16
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    w = jnp.asarray(rng.random(E).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    ref = jax.ops.segment_sum(x[src] * w[:, None], dst, N)
    for chunk in (128, 1024, 8192):
        out = _chunked_spmm(src, dst, w, x, N, chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_chunked_gradients():
    N, E, F = 100, 2000, 8
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    w = jnp.asarray(rng.random(E).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))

    def loss_ref(x, w):
        return ((jax.ops.segment_sum(x[src] * w[:, None], dst, N)
                 - tgt) ** 2).sum()

    def loss_chk(x, w):
        return ((_chunked_spmm(src, dst, w, x, N, 256) - tgt) ** 2).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gc = jax.grad(loss_chk, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)


def test_chunked_routing_and_padded_edges():
    """The ladder dispatches to the chunked path above the byte trigger
    and drops padded (sentinel) edges like every other path."""
    N, E, F = 64, 512, 8
    rng = np.random.default_rng(2)
    coo = rng.integers(0, N, (2, E)).astype(np.int32)
    coo[:, -16:] = N            # padded slots
    w = jnp.asarray(rng.random(E).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    ei = EdgeIndex(coo, (N, N))
    ref = spmm(ei, x, w)
    import sys
    sp = sys.modules['pytorch_geometric_tpu.ops.spmm']
    old = sp._CHUNK_TRIGGER_BYTES
    sp._CHUNK_TRIGGER_BYTES = 1.0
    try:
        out = sp.spmm(EdgeIndex(coo, (N, N)), x, w)
    finally:
        sp._CHUNK_TRIGGER_BYTES = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _make_parts(n=96, e=512, f=8, P_=8, seed=0):
    from pytorch_geometric_tpu.parallel import Partitioner, \
        gcn_norm_weights
    rng = np.random.default_rng(seed)
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int64)
    w = gcn_norm_weights(coo, n)
    data = Data(x=rng.standard_normal((n, f)).astype(np.float32),
                edge_index=coo.astype(np.int32), edge_weight=w,
                num_nodes=n)
    return Partitioner(data, P_).generate_partition(), coo, w, data


def test_ring_matches_halo_and_single_device():
    from jax import shard_map
    from pytorch_geometric_tpu.parallel import (partition_spmm_halo,
                                                partition_spmm_ring,
                                                build_ring_buckets)
    parts, coo, w, data = _make_parts()
    n, f = data.num_nodes, data.x.shape[1]
    x = np.asarray(data.x)
    P_ = parts.num_parts
    n_max = parts.n_max
    mesh = Mesh(np.array(jax.devices('cpu')[:P_]), ('graph',))

    x_sh = jnp.asarray(np.asarray(parts.x))
    rs, rd, rm, rw = build_ring_buckets(parts)

    def ring_body(x_own, rs, rd, rm, rw):
        return partition_spmm_ring(x_own[0], rs[0], rd[0], rm[0],
                                   rw[0])[None]

    ring_fn = shard_map(
        ring_body, mesh=mesh,
        in_specs=(P('graph'),) * 5, out_specs=P('graph'),
        check_vma=False)
    out_ring = np.asarray(ring_fn(
        x_sh, jnp.asarray(rs), jnp.asarray(rd), jnp.asarray(rm),
        jnp.asarray(rw)))

    def halo_body(x_own, hs, hm, es, ed, em, ew):
        return partition_spmm_halo(x_own[0], hs[0], hm[0], es[0],
                                   ed[0], em[0], ew[0])[None]

    halo_fn = shard_map(
        halo_body, mesh=mesh,
        in_specs=(P('graph'),) * 7, out_specs=P('graph'),
        check_vma=False)
    out_halo = np.asarray(halo_fn(
        x_sh, jnp.asarray(parts.halo_send),
        jnp.asarray(parts.halo_send_mask),
        jnp.asarray(parts.edge_src_halo), jnp.asarray(parts.edge_dst),
        jnp.asarray(parts.edge_mask), jnp.asarray(parts.edge_weight)))

    np.testing.assert_allclose(out_ring, out_halo, rtol=1e-5, atol=1e-5)

    # single-device reference, scattered back to partition layout
    ref = np.zeros((n, f), np.float32)
    np.add.at(ref, coo[1], x[coo[0]] * w[:, None])
    ref_parts = np.zeros((P_, n_max, f), np.float32)
    own_mask = np.asarray(parts.own_mask)
    ref_parts[own_mask] = ref[np.asarray(parts.own)[own_mask]]
    np.testing.assert_allclose(out_ring.reshape(P_, n_max, f)
                               * own_mask[..., None],
                               ref_parts, rtol=1e-5, atol=1e-5)


def test_ring_gradients_match_halo():
    from jax import shard_map
    from pytorch_geometric_tpu.parallel import (partition_spmm_halo,
                                                partition_spmm_ring,
                                                build_ring_buckets)
    parts, coo, w, data = _make_parts(seed=3)
    P_ = parts.num_parts
    mesh = Mesh(np.array(jax.devices('cpu')[:P_]), ('graph',))
    x_sh = jnp.asarray(np.asarray(parts.x))
    rs, rd, rm, rw = build_ring_buckets(parts)

    def loss_ring(x):
        def body(x_own, rs, rd, rm, rw):
            o = partition_spmm_ring(x_own[0], rs[0], rd[0], rm[0],
                                    rw[0])
            return jax.lax.psum((o ** 2).sum(), 'graph')
        fn = shard_map(body, mesh=mesh, in_specs=(P('graph'),) * 5,
                       out_specs=P(), check_vma=False)
        return fn(x, jnp.asarray(rs), jnp.asarray(rd), jnp.asarray(rm),
                  jnp.asarray(rw))

    def loss_halo(x):
        def body(x_own, hs, hm, es, ed, em, ew):
            o = partition_spmm_halo(x_own[0], hs[0], hm[0], es[0],
                                    ed[0], em[0], ew[0])
            return jax.lax.psum((o ** 2).sum(), 'graph')
        fn = shard_map(body, mesh=mesh, in_specs=(P('graph'),) * 7,
                       out_specs=P(), check_vma=False)
        return fn(x, jnp.asarray(parts.halo_send),
                  jnp.asarray(parts.halo_send_mask),
                  jnp.asarray(parts.edge_src_halo),
                  jnp.asarray(parts.edge_dst),
                  jnp.asarray(parts.edge_mask),
                  jnp.asarray(parts.edge_weight))

    g_ring = np.asarray(jax.grad(loss_ring)(x_sh))
    g_halo = np.asarray(jax.grad(loss_halo)(x_sh))
    np.testing.assert_allclose(g_ring, g_halo, rtol=1e-4, atol=1e-4)


def test_train_partition_parallel_ring_matches_halo():
    from pytorch_geometric_tpu.parallel import train_partition_parallel
    rng = np.random.default_rng(5)
    n, e, f, c = 64, 300, 8, 3
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    data = Data(x=rng.standard_normal((n, f)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, c, n).astype(np.int32),
                num_nodes=n)
    mesh = Mesh(np.array(jax.devices('cpu')[:8]), ('graph',))
    _, l_halo = train_partition_parallel(data, 8, hidden=16, num_steps=3,
                                         mesh=mesh)
    _, l_ring = train_partition_parallel(data, 8, hidden=16, num_steps=3,
                                         mesh=mesh, exchange='ring')
    np.testing.assert_allclose(l_ring, l_halo, rtol=1e-5, atol=1e-6)


def test_partition_gat_attention_matches_single_device():
    """Partition-parallel GAT: dst-partitioned edges make the union
    softmax device-local; only source rows ride the sparse halo.
    Forward AND gradients match the single-device computation."""
    from jax import shard_map
    from pytorch_geometric_tpu.parallel import partition_gat_attention

    parts, coo, w, data = _make_parts(f=8)
    n, f = data.num_nodes, 8
    h, c = 2, 4
    x = np.asarray(data.x)
    P_ = parts.num_parts
    n_max = parts.n_max
    mesh = Mesh(np.array(jax.devices('cpu')[:P_]), ('graph',))
    rng = np.random.default_rng(5)
    att_s = jnp.asarray(rng.standard_normal((h, c)).astype(np.float32))
    att_d = jnp.asarray(rng.standard_normal((h, c)).astype(np.float32))

    x_sh = jnp.asarray(np.asarray(parts.x)).reshape(P_, n_max, h, c)

    def body(x_own, hs, hm, es, ed, em, a_s, a_d):
        return partition_gat_attention(x_own[0], hs[0], hm[0], es[0],
                                       ed[0], em[0], a_s, a_d)[None]

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P('graph'),) * 6 + (P(), P()),
        out_specs=P('graph'), check_vma=False)
    args = (x_sh, jnp.asarray(parts.halo_send),
            jnp.asarray(parts.halo_send_mask),
            jnp.asarray(parts.edge_src_halo),
            jnp.asarray(parts.edge_dst), jnp.asarray(parts.edge_mask))
    out = np.asarray(fn(*args, att_s, att_d))

    # single-device oracle: per-dst softmax over the global graph
    xr = x.reshape(n, h, c)
    a_src_g = (xr * np.asarray(att_s)).sum(-1)
    a_dst_g = (xr * np.asarray(att_d)).sum(-1)
    valid = coo[1] < n
    base = a_src_g[np.minimum(coo[0], n - 1)] + \
        a_dst_g[np.minimum(coo[1], n - 1)]
    logit = np.where(base >= 0, base, 0.2 * base)
    ref = np.zeros((n, h, c), np.float32)
    for node in range(n):
        sel = np.nonzero(valid & (coo[1] == node))[0]
        if not len(sel):
            continue
        lo = logit[sel]
        a = np.exp(lo - lo.max(0))
        a = a / a.sum(0)
        ref[node] = (xr[coo[0][sel]] * a[:, :, None]).sum(0)

    own, own_mask = np.asarray(parts.own), np.asarray(parts.own_mask)
    ref_parts = np.zeros((P_, n_max, h, c), np.float32)
    ref_parts[own_mask] = ref[own[own_mask]]
    np.testing.assert_allclose(
        out.reshape(P_, n_max, h, c) * own_mask[..., None, None],
        ref_parts, rtol=2e-4, atol=2e-5)

    # gradients flow through the halo collective
    def loss(x_sh, a_s, a_d):
        return jnp.sum(fn(x_sh, *args[1:], a_s, a_d) ** 2)

    gx, gs, gd = jax.grad(loss, argnums=(0, 1, 2))(x_sh, att_s, att_d)

    def ref_loss(xf, a_s, a_d):
        xr = xf.reshape(n, h, c)
        a_src_g = (xr * a_s).sum(-1)
        a_dst_g = (xr * a_d).sum(-1)
        si = jnp.minimum(coo[0], n - 1)
        di = jnp.minimum(coo[1], n - 1)
        base = a_src_g[si] + a_dst_g[di]
        logit = jnp.where(base >= 0, base, 0.2 * base)
        from pytorch_geometric_tpu.ops.softmax import softmax
        alpha = softmax(logit, di, n, mask=jnp.asarray(valid))
        msg = xr[si] * alpha[:, :, None]
        msg = jnp.where(jnp.asarray(valid)[:, None, None], msg, 0)
        out = jax.ops.segment_sum(msg.reshape(-1, f),
                                  jnp.where(jnp.asarray(valid), di, n),
                                  n + 1)[:n]
        return jnp.sum(out ** 2)

    gxr, gsr, gdr = jax.grad(ref_loss, argnums=(0, 1, 2))(
        jnp.asarray(x), att_s, att_d)
    # scatter reference grads into partition layout
    gx_parts = np.zeros((P_, n_max, h, c), np.float32)
    gx_parts[own_mask] = np.asarray(gxr).reshape(n, h, c)[own[own_mask]]
    np.testing.assert_allclose(
        np.asarray(gx) * own_mask[..., None, None], gx_parts,
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gsr),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gdr),
                               rtol=2e-3, atol=2e-4)
