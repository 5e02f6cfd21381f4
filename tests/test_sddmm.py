"""Tests for the public SDDMM + fused segment-softmax primitives
(ops/sddmm.py) — the general-edge complement of ops/gat_fused.py.

Kernels run in Pallas interpreter mode on CPU; the same code path
compiles on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.edge_index import EdgeIndex
from pytorch_geometric_tpu.ops import softmax as segment_softmax
from pytorch_geometric_tpu.ops.sddmm import (
    edge_softmax, edge_softmax_aggregate, fused_softmax_available,
    multi_relation_softmax_aggregate, sddmm)

rng = np.random.default_rng(7)


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv('PGT_FORCE_PALLAS', '1')


def _graph(n=60, e=400, pad=32, seed=0):
    r = np.random.default_rng(seed)
    row = r.integers(0, n, e)
    col = r.integers(0, n, e)
    if pad:
        row = np.concatenate([row, np.full(pad, n)])
        col = np.concatenate([col, np.full(pad, n)])
    ei = EdgeIndex(jnp.asarray(np.stack([row, col]).astype(np.int32)),
                   sparse_size=(n, n))
    return ei.fill_cache(blocked=True)


def _ref_softmax_agg(coo, logits, values, n):
    """Plain numpy/XLA reference: softmax over dst then weighted sum."""
    dst = np.asarray(coo[1])
    valid = dst < n
    alpha = np.asarray(segment_softmax(
        jnp.asarray(logits), jnp.asarray(np.minimum(dst, n - 1)), n,
        mask=jnp.asarray(valid)))
    out = np.zeros((n,) + values.shape[1:], np.float32)
    for i in range(len(dst)):
        if valid[i]:
            out[dst[i]] += alpha[i][:, None] * values[i]
    return out


def test_sddmm_matches_dense():
    n, h, f = 40, 3, 8
    ei = _graph(n=n, e=150, pad=10)
    a = rng.standard_normal((n, h, f)).astype(np.float32)
    b = rng.standard_normal((n, h, f)).astype(np.float32)
    out = np.asarray(sddmm(ei, jnp.asarray(a), jnp.asarray(b)))
    coo = np.asarray(ei.coo)
    for e_i in range(coo.shape[1]):
        s, d = coo[0, e_i], coo[1, e_i]
        if s < n and d < n:
            np.testing.assert_allclose(
                out[e_i], (a[s] * b[d]).sum(-1), rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_allclose(out[e_i], 0)


def test_sddmm_2d_inputs():
    n = 30
    ei = _graph(n=n, e=100, pad=0)
    a = rng.standard_normal((n, 8)).astype(np.float32)
    out = sddmm(ei, jnp.asarray(a), jnp.asarray(a))
    assert out.shape == (100,)


def test_edge_softmax_matches_xla():
    n, h = 60, 4
    ei = _graph(n=n, e=400, pad=32)
    assert fused_softmax_available(ei)
    e_tot = ei.coo.shape[1]
    logits = rng.standard_normal((e_tot, h)).astype(np.float32) * 3
    dst = np.asarray(ei.coo[1])
    valid = dst < n
    ref = np.asarray(segment_softmax(
        jnp.asarray(logits), jnp.asarray(np.minimum(dst, n - 1)), n,
        mask=jnp.asarray(valid)))
    out = np.asarray(edge_softmax(ei, jnp.asarray(logits)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # padded edges get exactly zero
    assert np.all(out[~valid] == 0)


def test_edge_softmax_with_mask():
    n, h = 40, 2
    ei = _graph(n=n, e=200, pad=16)
    e_tot = ei.coo.shape[1]
    logits = rng.standard_normal((e_tot, h)).astype(np.float32)
    mask = rng.random(e_tot) > 0.3
    dst = np.asarray(ei.coo[1])
    valid = (dst < n) & mask
    ref = np.asarray(segment_softmax(
        jnp.asarray(logits), jnp.asarray(np.minimum(dst, n - 1)), n,
        mask=jnp.asarray(valid)))
    out = np.asarray(edge_softmax(ei, jnp.asarray(logits),
                                  edge_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_softmax_dispatches_to_fused(monkeypatch):
    """ops.softmax(edge_index=...) routes through the blocked kernel and
    matches the plain XLA path."""
    n, h = 50, 3
    ei = _graph(n=n, e=300, pad=12)
    e_tot = ei.coo.shape[1]
    logits = jnp.asarray(rng.standard_normal((e_tot, h)).astype(np.float32))
    dst = np.asarray(ei.coo[1])
    valid = jnp.asarray(dst < n)
    ref = segment_softmax(logits, jnp.asarray(np.minimum(dst, n - 1)), n,
                          mask=valid)
    out = segment_softmax(logits, jnp.asarray(np.minimum(dst, n - 1)), n,
                          mask=valid, edge_index=ei)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_edge_softmax_aggregate_matches_reference():
    n, h, f = 60, 4, 16
    ei = _graph(n=n, e=400, pad=32)
    e_tot = ei.coo.shape[1]
    logits = rng.standard_normal((e_tot, h)).astype(np.float32) * 2
    values = rng.standard_normal((e_tot, h, f)).astype(np.float32)
    out = np.asarray(edge_softmax_aggregate(
        ei, jnp.asarray(logits), jnp.asarray(values)))
    ref = _ref_softmax_agg(ei.coo, logits, values, n)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_edge_softmax_aggregate_grad():
    n, h, f = 40, 2, 8
    ei = _graph(n=n, e=250, pad=14)
    e_tot = ei.coo.shape[1]
    logits = jnp.asarray(
        rng.standard_normal((e_tot, h)).astype(np.float32))
    values = jnp.asarray(
        rng.standard_normal((e_tot, h, f)).astype(np.float32))
    dst = np.asarray(ei.coo[1])
    valid = jnp.asarray(dst < n)
    dsafe = jnp.asarray(np.minimum(dst, n - 1))

    def fused(l, v):
        return (edge_softmax_aggregate(ei, l, v) ** 2).sum()

    def ref(l, v):
        alpha = segment_softmax(l, dsafe, n, mask=valid)
        msg = (v * alpha[..., None]).reshape(len(dst), -1)
        from pytorch_geometric_tpu.ops import scatter
        out = scatter(msg, dsafe, n, 'sum', mask=valid)
        return (out.reshape(n, h, f) ** 2).sum()

    gl, gv = jax.grad(fused, argnums=(0, 1))(logits, values)
    rl, rv = jax.grad(ref, argnums=(0, 1))(logits, values)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(rl),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=1e-3, atol=1e-4)


def test_multi_relation_union_softmax():
    """Union softmax across two relations == softmax over concatenated
    edge sets (the HGT semantics, reference nn/conv/hgt_conv.py:100)."""
    n, h, f = 50, 2, 8
    ei1 = _graph(n=n, e=200, pad=8, seed=1)
    ei2 = _graph(n=n, e=150, pad=8, seed=2)
    l1 = rng.standard_normal((ei1.coo.shape[1], h)).astype(np.float32)
    l2 = rng.standard_normal((ei2.coo.shape[1], h)).astype(np.float32)
    v1 = rng.standard_normal((ei1.coo.shape[1], h, f)).astype(np.float32)
    v2 = rng.standard_normal((ei2.coo.shape[1], h, f)).astype(np.float32)
    out = np.asarray(multi_relation_softmax_aggregate(
        [(ei1, jnp.asarray(l1), jnp.asarray(v1), None),
         (ei2, jnp.asarray(l2), jnp.asarray(v2), None)], n))
    # reference: softmax over the UNION edge set
    coo = np.concatenate([np.asarray(ei1.coo), np.asarray(ei2.coo)], 1)
    ref = _ref_softmax_agg(coo, np.concatenate([l1, l2]),
                           np.concatenate([v1, v2]), n)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_multi_relation_grad_finite():
    n, h, f = 30, 2, 4
    ei1 = _graph(n=n, e=100, pad=4, seed=3)
    ei2 = _graph(n=n, e=80, pad=4, seed=4)
    l1 = jnp.asarray(rng.standard_normal(
        (ei1.coo.shape[1], h)).astype(np.float32))
    v1 = jnp.asarray(rng.standard_normal(
        (ei1.coo.shape[1], h, f)).astype(np.float32))
    l2 = jnp.asarray(rng.standard_normal(
        (ei2.coo.shape[1], h)).astype(np.float32))
    v2 = jnp.asarray(rng.standard_normal(
        (ei2.coo.shape[1], h, f)).astype(np.float32))

    def loss(l1, v1, l2, v2):
        return (multi_relation_softmax_aggregate(
            [(ei1, l1, v1, None), (ei2, l2, v2, None)], n) ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(l1, v1, l2, v2)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_isolated_node_rows_are_zero():
    """Destinations with no incoming edges produce zero output, not NaN."""
    n, h, f = 64, 2, 4
    row = np.arange(32, dtype=np.int32)
    col = np.zeros(32, dtype=np.int32)  # everything points at node 0
    ei = EdgeIndex(jnp.asarray(np.stack([row, col])), sparse_size=(n, n))
    ei = ei.fill_cache(blocked=True)
    logits = jnp.asarray(rng.standard_normal((32, h)).astype(np.float32))
    values = jnp.asarray(
        rng.standard_normal((32, h, f)).astype(np.float32))
    out = np.asarray(edge_softmax_aggregate(ei, logits, values))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[1:], 0, atol=1e-7)
