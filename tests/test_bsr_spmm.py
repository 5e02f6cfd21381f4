"""Block-sparse (BSR) cached-adjacency SpMM (ops/bsr_spmm.py).

Parity vs the XLA scatter path; gradient vs XLA autodiff; empty
block-row handling; profitability gate. Runs the Pallas kernel in
interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.ops.bsr_spmm import (
    BS, bsr_profitable, bsr_stats, build_bsr_pair, bsr_spmm)
from pytorch_geometric_tpu.ops.spmm import spmm


def _rand_graph(n_src, n_dst, e, f, seed=0):
    rng = np.random.default_rng(seed)
    coo = np.stack([rng.integers(0, n_src, e),
                    rng.integers(0, n_dst, e)]).astype(np.int32)
    w = rng.standard_normal(e).astype(np.float32)
    x = rng.standard_normal((n_src, f)).astype(np.float32)
    return coo, w, x


def _ref_spmm(coo, w, x, n_dst):
    out = np.zeros((n_dst, x.shape[1]), np.float32)
    np.add.at(out, coo[1], w[:, None] * x[coo[0]])
    return out


def test_bsr_forward_rectangular():
    coo, w, x = _rand_graph(300, 450, 4000, 70)
    fwd, bwd, res = build_bsr_pair(coo, w, 300, 450)
    assert res is None  # every block is dense enough here
    out = bsr_spmm(fwd, bwd, jnp.asarray(x), 450, 300)
    ref = _ref_spmm(coo, w, x, 450)
    rel = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert rel < 1e-5


def test_bsr_empty_block_rows_are_zero():
    coo, w, x = _rand_graph(500, 500, 6000, 33, seed=1)
    # empty out the third 128-dst block entirely
    coo[1][(coo[1] // BS) == 2] = 1
    ei = EdgeIndex(coo, (500, 500)).fill_cache(dense_weight=w,
                                               block_sparse=True)
    assert ei.bsr is not None and ei.dense_adj is None
    out = np.asarray(spmm(ei, jnp.asarray(x)))
    ref = _ref_spmm(coo, w, x, 500)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5
    assert np.abs(out[2 * BS:3 * BS]).max() == 0.0


def test_bsr_transpose_and_mean():
    coo, w, x = _rand_graph(400, 400, 5000, 17, seed=2)
    ei = EdgeIndex(coo, (400, 400)).fill_cache(dense_weight=w,
                                               block_sparse=True)
    out_t = np.asarray(spmm(ei, jnp.asarray(x), transpose=True))
    ref_t = np.zeros((400, 17), np.float32)
    np.add.at(ref_t, coo[0], w[:, None] * x[coo[1]])
    assert np.abs(out_t - ref_t).max() / np.abs(ref_t).max() < 1e-5
    # mean divides the block-summed output by in-degree
    out_m = np.asarray(spmm(ei, jnp.asarray(x), reduce='mean'))
    deg = np.maximum(np.bincount(coo[1], minlength=400), 1)
    ref_m = _ref_spmm(coo, w, x, 400) / deg[:, None]
    assert np.abs(out_m - ref_m).max() / np.abs(ref_m).max() < 1e-5


def test_bsr_grad_matches_xla():
    coo, w, x = _rand_graph(300, 450, 4000, 24, seed=3)
    ei = EdgeIndex(coo, (300, 450)).fill_cache(dense_weight=w,
                                               block_sparse=True)
    xj = jnp.asarray(x)

    def loss(x):
        return (spmm(ei, x) ** 2).sum()

    def loss_ref(x):
        m = jnp.asarray(w)[:, None] * x[coo[0]]
        return (jax.ops.segment_sum(m, jnp.asarray(coo[1]), 450) ** 2).sum()

    g = jax.jit(jax.grad(loss))(xj)
    g2 = jax.grad(loss_ref)(xj)
    assert float(jnp.abs(g - g2).max() / jnp.abs(g2).max()) < 1e-5


def test_bsr_profitability_gate():
    # clustered graph (edges inside 128-blocks): high edges/block
    rng = np.random.default_rng(4)
    base = rng.integers(0, 4, 8000) * BS
    coo_clustered = np.stack([base + rng.integers(0, BS, 8000),
                              base + rng.integers(0, BS, 8000)])
    nb, epb = bsr_stats(coo_clustered.astype(np.int32), 512, 512)
    assert nb == 4 and epb == 2000.0
    assert bsr_profitable(coo_clustered.astype(np.int32), 512, 512)
    # scattered graph over a huge id space: ~1 edge per block
    coo_sparse = np.stack([rng.integers(0, 10**6, 2000),
                           rng.integers(0, 10**6, 2000)]).astype(np.int64)
    assert not bsr_profitable(coo_sparse, 10**6, 10**6)


def test_fill_cache_dense_cap_falls_through_to_bsr(monkeypatch):
    monkeypatch.setenv('PGT_DENSE_SPMM_ENTRIES', '10000')  # tiny cap
    coo, w, _ = _rand_graph(400, 400, 5000, 8, seed=5)
    ei = EdgeIndex(coo, (400, 400)).fill_cache(dense_weight=w)
    assert ei.dense_adj is None and ei.bsr is not None
    # block_sparse=False suppresses the fallthrough
    ei2 = EdgeIndex(coo, (400, 400)).fill_cache(dense_weight=w,
                                                block_sparse=False)
    assert ei2.dense_adj is None and ei2.bsr is None


def test_bsr_hybrid_residual_edges():
    # a dense 2-block community plus a scattered tail across the id
    # space: the split keeps the community in BSR and leaves the tail
    # on the gather path; the sum must still be exact.
    rng = np.random.default_rng(6)
    n, f = 1024, 19
    e_dense, e_tail = 6000, 500
    blk = rng.integers(0, 2, e_dense) * BS
    coo_d = np.stack([blk + rng.integers(0, BS, e_dense),
                      blk + rng.integers(0, BS, e_dense)])
    # tail: one edge per (random) block pair so each stays under
    # min_fill
    coo_t = np.stack([rng.permutation(n)[:e_tail],
                      rng.permutation(n)[:e_tail]])
    coo = np.concatenate([coo_d, coo_t], 1).astype(np.int32)
    w = rng.standard_normal(coo.shape[1]).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = EdgeIndex(coo, (n, n)).fill_cache(dense_weight=w,
                                           block_sparse=True)
    assert ei.bsr is not None and ei.bsr_res is not None
    assert ei.bsr_res[0].shape[0] <= e_tail + BS  # tail only
    out = np.asarray(spmm(ei, jnp.asarray(x)))
    ref = _ref_spmm(coo, w, x, n)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5
    # gradient through the hybrid (BSR custom-vjp + XLA residual)
    def loss(x):
        return (spmm(ei, x) ** 2).sum()

    def loss_ref(x):
        m = jnp.asarray(w)[:, None] * x[coo[0]]
        return (jax.ops.segment_sum(m, jnp.asarray(coo[1]), n) ** 2).sum()

    g = jax.jit(jax.grad(loss))(jnp.asarray(x))
    g2 = jax.grad(loss_ref)(jnp.asarray(x))
    assert float(jnp.abs(g - g2).max() / jnp.abs(g2).max()) < 1e-5


def test_cache_gcn_norm_matches_uncached_conv(monkeypatch):
    # cache_gcn_norm (the TPU analog of GCNConv(cached=True)) must be
    # numerically identical to the conv's own normalize=True path, on
    # both the dense and the block-sparse cached layout.
    monkeypatch.setenv('PGT_FORCE_DENSE_SPMM', '1')
    from pytorch_geometric_tpu.nn import GCNConv, cache_gcn_norm
    rng = np.random.default_rng(7)
    n, e, f = 300, 2500, 16
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ei = EdgeIndex(coo, (n, n))
    conv = GCNConv(8)
    p = conv.init(jax.random.PRNGKey(0), x, ei)
    ref = conv.apply(p, x, ei)
    fast = GCNConv(8, normalize=False, add_self_loops=False)
    for kw in ({}, {'block_sparse': True}):
        ei_c = cache_gcn_norm(ei, **kw)
        out = fast.apply(p, x, ei_c)
        assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def _powerlaw_graph(n, e, f, seed=0):
    rng = np.random.default_rng(seed)
    pw = np.arange(1, n + 1) ** -0.9
    pw /= pw.sum()
    src, dst = rng.choice(n, e, p=pw), rng.choice(n, e, p=pw)
    sc = rng.permutation(n)  # scramble so the natural order is bad
    coo = np.stack([sc[src], sc[dst]]).astype(np.int32)
    w = rng.standard_normal(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    return coo, w, x


def test_bsr_internal_reorder_parity_and_grad():
    """Scale-free graph: fill_cache bakes a hubs-first relabel into the
    block layout; spmm must still match the XLA path in ORIGINAL ids,
    forward and d/dx."""
    n, e = 20000, 60000
    coo, w, x = _powerlaw_graph(n, e, 16)
    ei = EdgeIndex(coo, (n, n)).fill_cache(dense_weight=w,
                                           block_sparse=True)
    assert ei.bsr is not None
    assert ei.bsr_perm is not None  # the relabel actually triggered
    out = np.asarray(spmm(ei, jnp.asarray(x)))
    ref = _ref_spmm(coo, w, x, n)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    g = np.asarray(jax.grad(
        lambda xx: (spmm(ei, xx) ** 2).sum())(jnp.asarray(x)))
    gref = np.zeros_like(x)
    np.add.at(gref, coo[0], w[:, None] * (2 * ref)[coo[1]])
    np.testing.assert_allclose(g, gref, rtol=2e-3, atol=2e-3)


def test_bsr_reorder_transpose_parity():
    """flip() keeps the square relabel consistent: A^T x in original
    ids."""
    n, e = 20000, 60000
    coo, w, x = _powerlaw_graph(n, e, 12, seed=3)
    ei = EdgeIndex(coo, (n, n)).fill_cache(dense_weight=w,
                                           block_sparse=True)
    if ei.bsr_perm is None:
        pytest.skip('reorder did not trigger')
    out_t = np.asarray(spmm(ei.flip(), jnp.asarray(x)))
    ref_t = _ref_spmm(coo[::-1], w, x, n)
    np.testing.assert_allclose(out_t, ref_t, rtol=2e-4, atol=2e-4)


def test_bsr_reorder_reduces_blocks():
    n, e = 20000, 60000
    coo, w, _ = _powerlaw_graph(n, e, 8, seed=4)
    from pytorch_geometric_tpu.ops.bsr_spmm import choose_block_order
    perm, inv, cap, _ = choose_block_order(coo, n, n)
    assert perm is not None and cap > 0.5
    nb0, _ = bsr_stats(coo, n, n)
    nb1, _ = bsr_stats(inv[coo], n, n)
    assert nb1 < nb0


def test_bsr_reorder_tolerates_padded_edges():
    """Padded edges (both endpoints == num_nodes, the batch-padding
    sentinel) must survive the relabel path (regression: inv[coo]
    raised IndexError)."""
    n, e = 20000, 60000
    coo, w, x = _powerlaw_graph(n, e, 8, seed=5)
    pad = np.full((2, 500), n, np.int32)
    coo_p = np.concatenate([coo, pad], 1)
    w_p = np.concatenate([w, np.zeros(500, np.float32)])
    ei = EdgeIndex(coo_p, (n, n)).fill_cache(dense_weight=w_p,
                                             block_sparse=True)
    assert ei.bsr is not None
    out = np.asarray(spmm(ei, jnp.asarray(x)))
    ref = _ref_spmm(coo, w, x, n)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_bsr_bf16_storage_matches_f32():
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_tpu import EdgeIndex
    from pytorch_geometric_tpu.ops import spmm
    rng = np.random.default_rng(11)
    n, e, f = 600, 6000, 16
    # clustered so the BSR path captures most edges
    c = rng.integers(0, n // 128 + 1, e)
    src = np.clip(c * 128 + rng.integers(0, 128, e), 0, n - 1)
    dst = np.clip(c * 128 + rng.integers(0, 128, e), 0, n - 1)
    coo = np.stack([src, dst]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ei32 = EdgeIndex(coo, (n, n)).fill_cache(dense_weight=w,
                                             block_sparse=True)
    eib = EdgeIndex(coo, (n, n)).fill_cache(dense_weight=w,
                                            block_sparse=True,
                                            cache_dtype=jnp.bfloat16)
    assert eib.bsr.vals.dtype == jnp.bfloat16
    a = np.asarray(spmm(ei32, x))
    b = np.asarray(spmm(eib, x))
    rel = np.abs(b - a).max() / np.abs(a).max()
    assert rel < 0.02, rel
    # gradient path (transpose layout) too
    ga = np.asarray(jax.grad(lambda x: (spmm(ei32, x) ** 2).sum())(x))
    gb = np.asarray(jax.grad(lambda x: (spmm(eib, x) ** 2).sum())(x))
    relg = np.abs(gb - ga).max() / np.abs(ga).max()
    assert relg < 0.03, relg
