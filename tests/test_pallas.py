"""Pallas MXU segment-sum / SpMM kernel tests (interpreter mode on CPU;
the same code path compiles on TPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.edge_index import EdgeIndex
from pytorch_geometric_tpu.ops.pallas_spmm import (segment_sum_sorted,
                                                   csr_spmm, spmm_pallas)

rng = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv('PGT_FORCE_PALLAS', '1')


def test_segment_sum_matches_xla():
    e, f, n = 3000, 40, 200
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msg = rng.standard_normal((e, f)).astype(np.float32)
    out = segment_sum_sorted(jnp.asarray(msg), jnp.asarray(dst), n)
    ref = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(dst), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_segment_sum_with_gaps():
    """Node-id gaps force the overflow path."""
    e, f, n = 2500, 12, 100000
    dst = np.sort(rng.choice(n, 30))  # huge gaps
    dst = np.sort(np.repeat(dst, e // 30 + 1)[:e]).astype(np.int32)
    msg = rng.standard_normal((e, f)).astype(np.float32)
    out = segment_sum_sorted(jnp.asarray(msg), jnp.asarray(dst), n)
    ref = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(dst), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_segment_sum_grad():
    e, f, n = 1500, 8, 64
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msg = rng.standard_normal((e, f)).astype(np.float32)

    def loss(m):
        return (segment_sum_sorted(m, jnp.asarray(dst), n) ** 2).sum()

    g = jax.grad(loss)(jnp.asarray(msg))
    ref = jax.grad(lambda m: (jax.ops.segment_sum(
        m, jnp.asarray(dst), n) ** 2).sum())(jnp.asarray(msg))
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spmm_pallas_end_to_end():
    n, e, f = 300, 4000, 24
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = EdgeIndex(jnp.asarray(coo), (n, n)).fill_cache()
    out = spmm_pallas(ei, jnp.asarray(x), jnp.asarray(w))
    # dense reference
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (coo[0], coo[1]), w)
    ref = a.T @ x
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3,
                               atol=1e-3)


def test_spmm_pallas_grad_x_and_w():
    n, e, f = 120, 1200, 6
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = EdgeIndex(jnp.asarray(coo), (n, n)).fill_cache()

    def loss(x, w):
        return (spmm_pallas(ei, x, w) ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x),
                                            jnp.asarray(w))

    def ref_loss(x, w):
        csc = ei.get_csc()
        msg = x[csc.indices] * w[csc.perm][:, None]
        out = jax.ops.segment_sum(msg, ei.col[csc.perm], n)
        return (out ** 2).sum()

    rgx, rgw = jax.grad(ref_loss, argnums=(0, 1))(jnp.asarray(x),
                                                  jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rgx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rgw),
                               rtol=1e-3, atol=1e-3)


def test_blocked_layout_construction():
    from pytorch_geometric_tpu.edge_index import build_blocked_csc
    n, e = 300, 4000
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    blk = build_blocked_csc(coo, n)
    src, dst = np.asarray(blk.src), np.asarray(blk.dst)
    perm = np.asarray(blk.perm)
    base = np.asarray(blk.chunk_base)
    assert len(src) % 1024 == 0
    # every chunk's real dsts inside its 128-window
    C = len(src) // 1024
    for c in range(C):
        d = dst[c * 1024:(c + 1) * 1024]
        real = d < n
        if real.any():
            assert (d[real] >= base[c]).all()
            assert (d[real] < base[c] + 128).all()
    # perm round-trips the original edges exactly once
    real_perm = perm[perm < e]
    assert sorted(real_perm.tolist()) == list(range(e))
    np.testing.assert_array_equal(coo[0][real_perm], src[perm < e])
    np.testing.assert_array_equal(coo[1][real_perm], dst[perm < e])


def test_blocked_spmm_matches_dense():
    n, e, f = 260, 3500, 20
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = EdgeIndex(jnp.asarray(coo), (n, n)).fill_cache()
    assert ei.blocked is not None and ei.blocked_t is not None
    out = spmm_pallas(ei, jnp.asarray(x), jnp.asarray(w))
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (coo[0], coo[1]), w)
    np.testing.assert_allclose(np.asarray(out), a.T @ x, rtol=1e-3,
                               atol=1e-3)


def test_blocked_spmm_grads():
    n, e, f = 150, 1500, 8
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = EdgeIndex(jnp.asarray(coo), (n, n)).fill_cache()

    def loss(x, w):
        return (spmm_pallas(ei, x, w) ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x),
                                            jnp.asarray(w))

    def ref_loss(x, w):
        src = jnp.asarray(coo[0])
        dst = jnp.asarray(coo[1])
        out = jax.ops.segment_sum(x[src] * w[:, None], dst, n)
        return (out ** 2).sum()

    rgx, rgw = jax.grad(ref_loss, argnums=(0, 1))(jnp.asarray(x),
                                                  jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rgx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rgw),
                               rtol=1e-3, atol=1e-3)


class TestFusedGAT:
    """Fused softmax-aggregation (ops/gat_fused.py) vs the XLA path."""

    def _graph(self, n=300, e=2500, h=4, f=16, seed=0):
        rng = np.random.default_rng(seed)
        src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
        ei = EdgeIndex(jnp.asarray(np.stack([src, dst])),
                       (n, n)).fill_cache(blocked=True)
        logits = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32)) * 3
        v = jnp.asarray(rng.normal(size=(n, h, f)).astype(np.float32))
        return ei, jnp.asarray(src), jnp.asarray(dst), logits, v

    def test_matches_xla_softmax_aggregate(self):
        from pytorch_geometric_tpu.ops import softmax as seg_softmax
        from pytorch_geometric_tpu.ops.gat_fused import gat_aggregate
        ei, src, dst, logits, v = self._graph()
        n = v.shape[0]

        def ref(l, v):
            alpha = seg_softmax(l, dst, n)
            return jax.ops.segment_sum(v[src] * alpha[:, :, None], dst, n)

        o1 = ref(logits, v)
        o2 = gat_aggregate(ei, logits, v)
        assert float(jnp.abs(o1 - o2).max()) < 1e-5
        g1 = jax.grad(lambda l, v: (ref(l, v) ** 2).sum(),
                      argnums=(0, 1))(logits, v)
        g2 = jax.grad(lambda l, v: (gat_aggregate(ei, l, v) ** 2).sum(),
                      argnums=(0, 1))(logits, v)
        assert float(jnp.abs(g1[0] - g2[0]).max()) < 1e-4
        assert float(jnp.abs(g1[1] - g2[1]).max()) < 1e-4

    def test_edge_mask(self):
        from pytorch_geometric_tpu.ops import softmax as seg_softmax
        from pytorch_geometric_tpu.ops.gat_fused import gat_aggregate
        ei, src, dst, logits, v = self._graph(seed=1)
        n = v.shape[0]
        rng = np.random.default_rng(2)
        mask = jnp.asarray(rng.random(logits.shape[0]) < 0.7)
        lm = jnp.where(mask[:, None], logits, -jnp.inf)
        alpha = seg_softmax(lm, dst, n)
        alpha = jnp.where(mask[:, None], alpha, 0)
        o1 = jax.ops.segment_sum(v[src] * alpha[:, :, None], dst, n)
        o2 = gat_aggregate(ei, logits, v, edge_mask=mask)
        assert float(jnp.abs(o1 - o2).max()) < 1e-5

    def test_numerator_scale(self):
        from pytorch_geometric_tpu.ops import softmax as seg_softmax
        from pytorch_geometric_tpu.ops.gat_fused import gat_aggregate
        ei, src, dst, logits, v = self._graph(seed=3)
        n = v.shape[0]
        rng = np.random.default_rng(4)
        scale = jnp.asarray((rng.random(logits.shape) < 0.5)
                            .astype(np.float32)) * 2.0
        alpha = seg_softmax(logits, dst, n) * scale
        o1 = jax.ops.segment_sum(v[src] * alpha[:, :, None], dst, n)
        o2 = gat_aggregate(ei, logits, v, numerator_scale=scale)
        assert float(jnp.abs(o1 - o2).max()) < 1e-5

    def test_gatconv_dispatch_parity(self):
        from pytorch_geometric_tpu import backend
        from pytorch_geometric_tpu.nn.conv import GATConv
        ei, src, dst, logits, v = self._graph(n=120, e=800, f=8)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(120, 10)).astype(np.float32))
        m = GATConv(out_channels=6, heads=3, add_self_loops=False)
        params = m.init(jax.random.PRNGKey(0), x, ei)
        try:
            backend.use_pallas_spmm = True
            out_fused = m.apply(params, x, ei)
            backend.use_pallas_spmm = False
            out_ref = m.apply(params, x, ei)
        finally:
            backend.use_pallas_spmm = None
        assert float(jnp.abs(out_fused - out_ref).max()) < 1e-4
