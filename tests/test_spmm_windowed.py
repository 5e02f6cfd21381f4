"""Windowed giant-E SpMM path (ops/spmm.py _windowed_spmm +
EdgeIndex.build_windowed_csc) vs the scatter oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.edge_index import (EdgeIndex,
                                              build_windowed_csc)
from pytorch_geometric_tpu.ops import spmm, spmm_regime
from pytorch_geometric_tpu.ops.spmm import _windowed_spmm

rng = np.random.default_rng(7)


def make_graph(n_src=200, n_dst=150, e=2000, pad=0):
    coo = np.stack([rng.integers(0, n_src, e),
                    rng.integers(0, n_dst, e)]).astype(np.int32)
    if pad:
        # loader-style padding: endpoints out of range
        coo = np.concatenate(
            [coo, np.stack([np.full(pad, n_src, np.int32),
                            np.full(pad, n_dst, np.int32)])], axis=1)
    return coo


def windowed_ei(coo, n_src, n_dst, chunk=256):
    ei = EdgeIndex(coo, (n_src, n_dst))
    win = build_windowed_csc(coo, n_dst, n_src, chunk_edges=chunk)
    win_t = build_windowed_csc(coo[::-1], n_src, n_dst, chunk_edges=chunk)
    return EdgeIndex(coo, (n_src, n_dst), win=win, win_t=win_t)


def oracle(coo, w, x, n_src, n_dst):
    out = np.zeros((n_dst, x.shape[1]), np.float64)
    for i in range(coo.shape[1]):
        s, d = int(coo[0, i]), int(coo[1, i])
        if s < n_src and d < n_dst:
            out[d] += (w[i] if w is not None else 1.0) * x[s].astype(
                np.float64)
    return out.astype(np.float32)


@pytest.mark.parametrize('pad', [0, 7])
@pytest.mark.parametrize('weighted', [False, True])
def test_windowed_matches_oracle(pad, weighted):
    n_src, n_dst, e = 180, 140, 1500
    coo = make_graph(n_src, n_dst, e, pad=pad)
    x = rng.standard_normal((n_src, 12)).astype(np.float32)
    w = (rng.standard_normal(coo.shape[1]).astype(np.float32)
         if weighted else None)
    adj = windowed_ei(coo, n_src, n_dst, chunk=200)
    assert spmm_regime(adj) == 'windowed'
    out = spmm(adj, jnp.asarray(x),
               None if w is None else jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out),
                               oracle(coo, w, x, n_src, n_dst),
                               rtol=1e-4, atol=1e-4)


def test_windowed_grads_match_dense():
    """grad_x and grad_w vs autodiff through an explicit dense matmul."""
    n_src, n_dst, e = 60, 50, 400
    coo = make_graph(n_src, n_dst, e)
    x = jnp.asarray(rng.standard_normal((n_src, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    adj = windowed_ei(coo, n_src, n_dst, chunk=64)
    g_out = jnp.asarray(
        rng.standard_normal((n_dst, 8)).astype(np.float32))

    def f_win(w, x):
        return jnp.sum(_windowed_spmm(adj.win, adj.win_t, w, x,
                                      n_src, n_dst) * g_out)

    def f_dense(w, x):
        A = jnp.zeros((n_dst, n_src)).at[coo[1], coo[0]].add(w)
        return jnp.sum((A @ x) * g_out)

    gw, gx = jax.grad(f_win, argnums=(0, 1))(w, x)
    gw_ref, gx_ref = jax.grad(f_dense, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)

    # unweighted op: grad_x only
    gx2 = jax.grad(
        lambda x: jnp.sum(_windowed_spmm(adj.win, adj.win_t, None, x,
                                         n_src, n_dst) * g_out))(x)
    gx2_ref = jax.grad(
        lambda x: f_dense(jnp.ones((e,)), x))(x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx2_ref),
                               rtol=1e-4, atol=1e-4)


def test_windowed_transpose_and_mean():
    n_src, n_dst, e = 90, 70, 700
    coo = make_graph(n_src, n_dst, e)
    adj = windowed_ei(coo, n_src, n_dst, chunk=128)
    x = rng.standard_normal((n_dst, 6)).astype(np.float32)
    out = spmm(adj, jnp.asarray(x), transpose=True)
    np.testing.assert_allclose(
        np.asarray(out), oracle(coo[::-1], None, x, n_dst, n_src),
        rtol=1e-4, atol=1e-4)
    # mean over destinations
    x2 = rng.standard_normal((n_src, 6)).astype(np.float32)
    out = spmm(adj, jnp.asarray(x2), reduce='mean')
    deg = np.zeros(n_dst)
    np.add.at(deg, coo[1][coo[1] < n_dst], 1)
    ref = oracle(coo, None, x2, n_src, n_dst) / np.maximum(
        deg, 1)[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                               atol=1e-4)


def test_windowed_inside_jit_and_pytree():
    """The layout must survive the pytree boundary (jit arg) and run
    under jit with static window shapes."""
    n_src = n_dst = 64
    coo = make_graph(n_src, n_dst, 300)
    adj = windowed_ei(coo, n_src, n_dst, chunk=64)
    x = jnp.asarray(rng.standard_normal((n_src, 4)).astype(np.float32))

    @jax.jit
    def f(adj, x):
        return spmm(adj, x)

    out = f(adj, x)
    np.testing.assert_allclose(np.asarray(out),
                               oracle(coo, None, np.asarray(x),
                                      n_src, n_dst),
                               rtol=1e-4, atol=1e-4)


def test_fill_cache_auto_windowed_build():
    """auto=True builds the windowed pair past the edge threshold (the
    threshold is env-tunable; force a tiny one)."""
    import os
    n = 50
    coo = make_graph(n, n, 600)
    os.environ['PGT_AUTO_WIN_MIN_EDGES'] = '100'
    # keep the graph off the dense regime so auto lands on windowed
    os.environ['PGT_DENSE_SPMM_ENTRIES'] = '10'
    try:
        adj = EdgeIndex(coo, (n, n)).fill_cache(auto=True,
                                                block_sparse=False)
    finally:
        del os.environ['PGT_AUTO_WIN_MIN_EDGES']
        del os.environ['PGT_DENSE_SPMM_ENTRIES']
    assert adj.win is not None and adj.win_t is not None
    # carried auto-unit weights would be the identity — must NOT be set
    assert adj.weight is None
    x = rng.standard_normal((n, 5)).astype(np.float32)
    out = spmm(adj, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out),
                               oracle(coo, None, x, n, n),
                               rtol=1e-4, atol=1e-4)


def test_gat_flash_parity():
    """GATConv's giant-graph flash path (forced via env caps) must
    match the XLA softmax path — outputs and input gradients."""
    import os
    import flax.linen as fnn  # noqa: F401
    from pytorch_geometric_tpu.nn import GATConv

    n, e = 40, 300
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    # pad a few invalid edges
    coo = np.concatenate(
        [coo, np.array([[n, 5], [3, n]], np.int32)], axis=1)
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    mod = GATConv(out_channels=8, heads=4)
    params = mod.init(jax.random.PRNGKey(0), x, coo)

    out_ref = mod.apply(params, x, coo)
    g_ref = jax.grad(
        lambda x: jnp.sum(mod.apply(params, x, coo) ** 2))(x)

    os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
    os.environ['PGT_ATTN_CHUNK_EDGES'] = '64'
    try:
        out_f = mod.apply(params, x, coo)
        g_f = jax.grad(
            lambda x: jnp.sum(mod.apply(params, x, coo) ** 2))(x)
        gp_f = jax.grad(lambda p: jnp.sum(
            mod.apply(p, x, coo) ** 2))(params)
    finally:
        del os.environ['PGT_ATTN_WIDE_BYTES']
        del os.environ['PGT_ATTN_CHUNK_EDGES']
    gp_ref = jax.grad(lambda p: jnp.sum(
        mod.apply(p, x, coo) ** 2))(params)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=5e-4, atol=1e-5)
    flat_r = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(gp_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(gp_f):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_r[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_gatv2_flash_parity():
    """GATv2Conv's giant-graph flash path (joint-feature logits
    computed per chunk) matches the XLA path — outputs and grads."""
    import os
    from pytorch_geometric_tpu.nn import GATv2Conv

    n, e = 36, 250
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    coo = np.concatenate(
        [coo, np.array([[n, 2], [7, n]], np.int32)], axis=1)
    x = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    mod = GATv2Conv(out_channels=6, heads=3)
    params = mod.init(jax.random.PRNGKey(0), x, coo)
    out_ref = mod.apply(params, x, coo)
    gp_ref = jax.grad(lambda p: jnp.sum(
        mod.apply(p, x, coo) ** 2))(params)
    os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
    os.environ['PGT_ATTN_CHUNK_EDGES'] = '48'
    try:
        out_f = mod.apply(params, x, coo)
        gp_f = jax.grad(lambda p: jnp.sum(
            mod.apply(p, x, coo) ** 2))(params)
    finally:
        del os.environ['PGT_ATTN_WIDE_BYTES']
        del os.environ['PGT_ATTN_CHUNK_EDGES']
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-6)
    flat_r = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(gp_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(gp_f):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_r[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_gat_flash_bwd_wide_heads():
    """Regression: 16 <= heads < 128 crashed _gat_flash_bwd (carry
    width max(128, h) vs un-padded [C, h] dbase — advisor round 4)."""
    from pytorch_geometric_tpu.ops.edge_attention import (
        gat_flash_attention)

    n, e, h, c = 20, 90, 16, 4
    src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    a_src = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_dst = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, h, c)).astype(np.float32))

    def flash(a_s, a_d, vv):
        return jnp.sum(gat_flash_attention(a_s, a_d, vv, src, dst, n,
                                           chunk=32) ** 2)

    def oracle(a_s, a_d, vv):
        base = a_s[src] + a_d[dst]                        # [E, H]
        logit = jnp.where(base >= 0, base, 0.2 * base)
        mx = jax.ops.segment_max(logit, dst, n)
        z = jnp.exp(logit - mx[dst])
        den = jax.ops.segment_sum(z, dst, n)
        alpha = z / jnp.maximum(den, 1e-16)[dst]
        msg = vv[src] * alpha[:, :, None]
        return jnp.sum(jax.ops.segment_sum(
            msg.reshape(e, -1), dst, n) ** 2)

    g_f = jax.grad(flash, argnums=(0, 1, 2))(a_src, a_dst, v)
    g_o = jax.grad(oracle, argnums=(0, 1, 2))(a_src, a_dst, v)
    for gf, go in zip(g_f, g_o):
        np.testing.assert_allclose(np.asarray(gf).reshape(go.shape),
                                   np.asarray(go), rtol=5e-4, atol=1e-5)


def test_flash_scatter_vs_segment_impls():
    """The scatter-based online-softmax scan (in-place sorted
    scatter-max / scatter-multiply rescale / scatter-add — the
    full-MAG carry-traffic fix) must be numerically equivalent to the
    segment-op scan, including a hub dst spanning many chunks and
    rows first touched mid-scan."""
    import os
    from pytorch_geometric_tpu.ops import edge_attention as ea

    n_src, n_dst, h, dh = 25, 18, 4, 8
    # hub row 7: 120 edges; plus random tail; plus rows only touched
    # by late chunks (high dst ids appear last after sorting)
    dst = np.concatenate([np.full(120, 7), np.arange(10, 18).repeat(3),
                          np.zeros(5)]).astype(np.int32)
    src = rng.integers(0, n_src, len(dst)).astype(np.int32)
    order = np.argsort(dst, kind='stable')
    src, dst = src[order], dst[order]
    e = len(dst)
    c = 16                               # ~10 chunks; hub spans 8
    nc = -(-e // c)
    pad = nc * c - e
    s_ch = jnp.asarray(np.pad(src, (0, pad)).reshape(nc, c))
    d_ch = jnp.asarray(np.pad(dst, (0, pad),
                              constant_values=n_dst).reshape(nc, c))
    rel = np.zeros(e, np.int32)
    r_ch = jnp.asarray(np.pad(rel, (0, pad)).reshape(nc, c))

    k = jnp.asarray(rng.standard_normal((n_src, h * dh)).astype(
        np.float32))
    v = jnp.asarray(rng.standard_normal((n_src, h * dh)).astype(
        np.float32))
    q = jnp.asarray(rng.standard_normal((n_dst, h, dh)).astype(
        np.float32))
    p = jnp.asarray(rng.standard_normal((1, h)).astype(np.float32))

    def run(impl):
        os.environ['PGT_ATTN_FLASH_IMPL'] = impl
        try:
            def f(k, v, q, p):
                out = ea._attention_flash(n_dst, True, k, v, q, p,
                                          r_ch, s_ch, d_ch)
                return jnp.sum(out ** 2), out
            (loss, out), grads = jax.value_and_grad(
                f, argnums=(0, 1, 2, 3), has_aux=True)(k, v, q, p)
            return out, grads
        finally:
            del os.environ['PGT_ATTN_FLASH_IMPL']

    out_sc, g_sc = run('scatter')
    out_sg, g_sg = run('segment')
    np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_sg),
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(g_sc, g_sg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)

    # GAT form through the public wrapper
    a_src = jnp.asarray(rng.standard_normal((n_src, h)).astype(
        np.float32))
    a_dst = jnp.asarray(rng.standard_normal((n_dst, h)).astype(
        np.float32))
    vv = jnp.asarray(rng.standard_normal((n_src, h, dh)).astype(
        np.float32))
    os.environ['PGT_ATTN_SORT_MIN_EDGES'] = '1'
    try:
        outs = {}
        for impl in ('scatter', 'segment'):
            os.environ['PGT_ATTN_FLASH_IMPL'] = impl
            outs[impl] = ea.gat_flash_attention(
                a_src, a_dst, vv, jnp.asarray(src), jnp.asarray(dst),
                n_dst, chunk=16)
    finally:
        del os.environ['PGT_ATTN_SORT_MIN_EDGES']
        os.environ.pop('PGT_ATTN_FLASH_IMPL', None)
    np.testing.assert_allclose(np.asarray(outs['scatter']),
                               np.asarray(outs['segment']),
                               rtol=2e-5, atol=1e-6)


def test_gat_flash_block_api_matches_oneshot():
    """Resumable fwd/bwd blocks (multi-dispatch giant-graph records)
    reproduce the one-shot flash scan exactly."""
    import jax
    from pytorch_geometric_tpu.ops import edge_attention as ea

    n_src, n_dst, h, dh = 22, 15, 4, 8
    e, c = 200, 16
    src = rng.integers(0, n_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n_dst, e)).astype(np.int32)
    nc = -(-e // c)
    pad = nc * c - e
    s_ch = jnp.asarray(np.pad(src, (0, pad)).reshape(nc, c))
    d_ch = jnp.asarray(np.pad(dst, (0, pad),
                              constant_values=n_dst).reshape(nc, c))
    a_src = jnp.asarray(rng.standard_normal((n_src, h)).astype(
        np.float32))
    a_dst = jnp.asarray(rng.standard_normal((n_dst, h)).astype(
        np.float32))
    v = jnp.asarray(rng.standard_normal((n_src, h * dh)).astype(
        np.float32))

    # one-shot reference (scatter impl, sorted)
    def f(a_s, a_d, vv):
        out = ea._gat_flash(n_dst, 0.2, True, a_s, a_d, vv, s_ch, d_ch)
        return jnp.sum(out ** 2), out
    (_, out_ref), (gs_ref, gd_ref, gv_ref) = jax.value_and_grad(
        f, argnums=(0, 1, 2), has_aux=True)(a_src, a_dst, v)

    # block-wise: two fwd dispatches, two bwd dispatches
    carry = ea.gat_flash_fwd_start(n_dst, h, dh)
    for blk in (slice(0, nc // 2), slice(nc // 2, nc)):
        carry = ea.gat_flash_fwd_block(n_dst, 0.2, a_src, a_dst, v,
                                       s_ch[blk], d_ch[blk], carry)
    m, l, out_flat = ea.gat_flash_fwd_finish(n_dst, h, dh, carry)
    np.testing.assert_allclose(
        np.asarray(out_flat).reshape(n_dst, h, dh),
        np.asarray(out_ref), rtol=1e-6, atol=1e-7)

    g_flat = 2.0 * out_flat                     # d(sum out^2)/d out
    bc = ea.gat_flash_bwd_start(n_src, n_dst, h, h * dh)
    for blk in (slice(0, nc // 2), slice(nc // 2, nc)):
        bc = ea.gat_flash_bwd_block(n_dst, 0.2, a_src, a_dst, v, m, l,
                                    out_flat, g_flat, s_ch[blk],
                                    d_ch[blk], bc)
    dsrc, ddst, dv = ea.gat_flash_bwd_finish(n_dst, h, bc)
    np.testing.assert_allclose(np.asarray(dsrc), np.asarray(gs_ref),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ddst), np.asarray(gd_ref),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv_ref),
                               rtol=5e-5, atol=1e-6)

    # src-sorted backward blocks (the gat-md record default): same
    # grads from the SRC-ordered chunking with s==n_src sentinel pads
    order_b = np.argsort(src, kind='stable')
    sb = np.pad(src[order_b], (0, pad), constant_values=n_src)
    db = np.pad(dst[order_b], (0, pad), constant_values=n_dst)
    sb_ch = jnp.asarray(sb.reshape(nc, c))
    db_ch = jnp.asarray(db.reshape(nc, c))
    bc2 = ea.gat_flash_bwd_start(n_src, n_dst, h, h * dh)
    for blk in (slice(0, nc // 2), slice(nc // 2, nc)):
        bc2 = ea.gat_flash_bwd_block(n_dst, 0.2, a_src, a_dst, v, m,
                                     l, out_flat, g_flat, sb_ch[blk],
                                     db_ch[blk], bc2, src_sorted=True)
    dsrc2, ddst2, dv2 = ea.gat_flash_bwd_finish(n_dst, h, bc2)
    np.testing.assert_allclose(np.asarray(dsrc2), np.asarray(gs_ref),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ddst2), np.asarray(gd_ref),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(gv_ref),
                               rtol=5e-5, atol=1e-6)


def test_gatv2_flash_scatter_vs_segment_grads():
    """GATv2 form: scatter vs segment flash impls agree on outputs AND
    parameter gradients under the sorted path."""
    import os
    from pytorch_geometric_tpu.ops import edge_attention as ea

    n_src, n_dst, h, dh = 20, 14, 3, 8
    e, c = 150, 16
    src = rng.integers(0, n_src, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n_dst, e)).astype(np.int32)
    nc = -(-e // c)
    pad = nc * c - e
    s_ch = jnp.asarray(np.pad(src, (0, pad)).reshape(nc, c))
    d_ch = jnp.asarray(np.pad(dst, (0, pad),
                              constant_values=n_dst).reshape(nc, c))
    x_l = jnp.asarray(rng.standard_normal((n_src, h * dh)).astype(
        np.float32))
    x_r = jnp.asarray(rng.standard_normal((n_dst, h * dh)).astype(
        np.float32))
    att = jnp.asarray(rng.standard_normal((h * dh,)).astype(
        np.float32))

    def run(impl):
        os.environ['PGT_ATTN_FLASH_IMPL'] = impl
        try:
            def f(xl, xr, a):
                out = ea._gatv2_flash(n_dst, 0.2, h, True, xl, xr, a,
                                      s_ch, d_ch)
                return jnp.sum(out ** 2), out
            (_, out), grads = jax.value_and_grad(
                f, argnums=(0, 1, 2), has_aux=True)(x_l, x_r, att)
            return out, grads
        finally:
            del os.environ['PGT_ATTN_FLASH_IMPL']

    out_sc, g_sc = run('scatter')
    out_sg, g_sg = run('segment')
    np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_sg),
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(g_sc, g_sg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize('impl', ['scatter', 'segment'])
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_flash_scatter_fuzz_vs_dense_oracle(seed, impl, monkeypatch):
    """Random shapes/chunks: BOTH flash impls == dense softmax oracle
    (the CPU default is segment — force each explicitly so the TPU
    default scatter path keeps fuzz coverage in CI)."""
    monkeypatch.setenv('PGT_ATTN_FLASH_IMPL', impl)
    from pytorch_geometric_tpu.ops import edge_attention as ea

    r = np.random.default_rng(seed)
    n_src = int(r.integers(5, 40))
    n_dst = int(r.integers(3, 30))
    h = int(r.choice([1, 2, 4, 5]))
    dh = int(r.choice([3, 8, 16]))
    e = int(r.integers(10, 300))
    c = int(r.choice([7, 16, 33]))
    src = r.integers(0, n_src, e).astype(np.int32)
    dst = np.sort(r.integers(0, n_dst, e)).astype(np.int32)
    nc = -(-e // c)
    pad = nc * c - e
    s_ch = jnp.asarray(np.pad(src, (0, pad)).reshape(nc, c))
    d_ch = jnp.asarray(np.pad(dst, (0, pad),
                              constant_values=n_dst).reshape(nc, c))
    rel_ch = jnp.asarray(np.zeros((nc, c), np.int32))
    k = r.standard_normal((n_src, h * dh)).astype(np.float32)
    v = r.standard_normal((n_src, h * dh)).astype(np.float32)
    q = r.standard_normal((n_dst, h, dh)).astype(np.float32)
    p = r.standard_normal((1, h)).astype(np.float32)

    out = ea._attention_flash(n_dst, True, jnp.asarray(k),
                              jnp.asarray(v), jnp.asarray(q),
                              jnp.asarray(p), rel_ch, s_ch, d_ch)

    # dense oracle
    logit = ((q.reshape(n_dst, h * dh)[dst] * k[src])
             .reshape(e, h, dh).sum(-1) * p[0])      # [E, H]
    expect = np.zeros((n_dst, h, dh), np.float32)
    for node in range(n_dst):
        sel = np.nonzero(dst == node)[0]
        if not len(sel):
            continue
        lo = logit[sel]
        a = np.exp(lo - lo.max(0))
        a = a / a.sum(0)
        expect[node] = (v[src[sel]].reshape(-1, h, dh)
                        * a[:, :, None]).sum(0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4,
                               atol=2e-5)
