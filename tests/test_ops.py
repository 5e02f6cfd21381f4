import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.ops import (scatter, scatter_argmax, segment,
                                       softmax, spmm, ptr2index, index2ptr)
from pytorch_geometric_tpu.edge_index import EdgeIndex


SRC = jnp.asarray(np.array([[1., 2.], [3., 4.], [5., 6.], [7., 8.]]))
IDX = jnp.asarray(np.array([0, 1, 0, 2]))


def test_scatter_sum():
    out = scatter(SRC, IDX, 3, reduce='sum')
    np.testing.assert_allclose(out, [[6., 8.], [3., 4.], [7., 8.]])


def test_scatter_mean():
    out = scatter(SRC, IDX, 3, reduce='mean')
    np.testing.assert_allclose(out, [[3., 4.], [3., 4.], [7., 8.]])


def test_scatter_min_max():
    out = scatter(SRC, IDX, 4, reduce='max')
    np.testing.assert_allclose(out, [[5., 6.], [3., 4.], [7., 8.], [0., 0.]])
    out = scatter(SRC, IDX, 4, reduce='min')
    np.testing.assert_allclose(out, [[1., 2.], [3., 4.], [7., 8.], [0., 0.]])


def test_scatter_mul():
    out = scatter(SRC, IDX, 3, reduce='mul')
    np.testing.assert_allclose(out, [[5., 12.], [3., 4.], [7., 8.]])


def test_scatter_padding_dropped():
    # index == dim_size rows must vanish
    idx = jnp.asarray([0, 1, 3, 3])
    out = scatter(SRC, idx, 3, reduce='sum')
    np.testing.assert_allclose(out, [[1., 2.], [3., 4.], [0., 0.]])


def test_scatter_mask():
    mask = jnp.asarray([True, False, True, True])
    out = scatter(SRC, IDX, 3, reduce='sum', mask=mask)
    np.testing.assert_allclose(out, [[6., 8.], [0., 0.], [7., 8.]])


def test_scatter_argmax():
    vals = jnp.asarray([1., 9., 5., 7.])
    out = scatter_argmax(vals, IDX, 3)
    np.testing.assert_array_equal(out, [2, 1, 3])


def test_ptr_roundtrip():
    index = jnp.asarray([0, 0, 1, 2, 2, 2])
    ptr = index2ptr(index, 3)
    np.testing.assert_array_equal(ptr, [0, 2, 3, 6])
    np.testing.assert_array_equal(ptr2index(ptr, 6), index)


def test_segment():
    ptr = jnp.asarray([0, 2, 2, 4])
    out = segment(SRC, ptr, 3, reduce='sum')
    np.testing.assert_allclose(out, [[4., 6.], [0., 0.], [12., 14.]])


def test_softmax_grouped():
    alpha = jnp.asarray([1., 2., 3., 4.])
    idx = jnp.asarray([0, 0, 1, 1])
    out = softmax(alpha, idx, 2)
    e = np.exp([1., 2., 3., 4.])
    expect = np.array([e[0] / (e[0] + e[1]), e[1] / (e[0] + e[1]),
                       e[2] / (e[2] + e[3]), e[3] / (e[2] + e[3])])
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_softmax_mask():
    alpha = jnp.asarray([1., 2., 3., 4.])
    idx = jnp.asarray([0, 0, 1, 1])
    mask = jnp.asarray([True, True, False, True])
    out = softmax(alpha, idx, 2, mask=mask)
    assert out[2] == 0.0
    np.testing.assert_allclose(out[3], 1.0, rtol=1e-5)


def test_spmm_matches_dense():
    rng = np.random.default_rng(0)
    n, e, f = 20, 80, 8
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    w = rng.standard_normal(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = EdgeIndex(np.stack([row, col]), (n, n))
    out = spmm(ei, jnp.asarray(x), jnp.asarray(w))
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (col, row), w)  # out[dst] = sum_src w * x[src]
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_spmm_cached_orientation_matches():
    rng = np.random.default_rng(1)
    n, e, f = 15, 60, 4
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ei = EdgeIndex(np.stack([row, col]), (n, n))
    out_plain = spmm(ei, x)
    out_cached = spmm(ei.fill_cache(), x)
    np.testing.assert_allclose(out_plain, out_cached, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('reduce', ['sum', 'mean', 'min', 'max'])
def test_spmm_reduces(reduce):
    rng = np.random.default_rng(2)
    n, e, f = 10, 40, 4
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    ei = EdgeIndex(np.stack([row, col]), (n, n))
    out = np.asarray(spmm(ei, jnp.asarray(x), reduce=reduce))
    # reference computation
    expect = np.zeros((n, f), np.float32)
    for d in range(n):
        msgs = x[row[col == d]]
        if len(msgs) == 0:
            continue
        if reduce == 'sum':
            expect[d] = msgs.sum(0)
        elif reduce == 'mean':
            expect[d] = msgs.mean(0)
        elif reduce == 'min':
            expect[d] = msgs.min(0)
        elif reduce == 'max':
            expect[d] = msgs.max(0)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_spmm_grad():
    import jax
    rng = np.random.default_rng(3)
    n, e, f = 8, 30, 4
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    w = jnp.asarray(rng.standard_normal(e).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    ei = EdgeIndex(np.stack([row, col]), (n, n))

    def loss(x, w):
        return spmm(ei, x, w).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    # d loss / d x[s] = sum over edges from s of w
    expect_gx = np.zeros((n, f), np.float32)
    for s, wv in zip(row, np.asarray(w)):
        expect_gx[s] += wv
    np.testing.assert_allclose(gx, expect_gx, rtol=1e-4, atol=1e-4)
    expect_gw = np.asarray(x)[row].sum(1)
    np.testing.assert_allclose(gw, expect_gw, rtol=1e-4, atol=1e-4)


def test_typed_matmul_grouped_matches_dense():
    """(reference pyg_lib.ops.segment_matmul parity)."""
    import jax
    from pytorch_geometric_tpu.ops import build_typed_layout, typed_matmul
    rng2 = np.random.default_rng(7)
    N, F, C, R = 200, 8, 12, 15
    x = jnp.asarray(rng2.normal(size=(N, F)).astype(np.float32))
    types = rng2.integers(0, R, N)
    W = jnp.asarray(rng2.normal(size=(R, F, C)).astype(np.float32))
    dense = typed_matmul(x, jnp.asarray(types), W)
    lay = build_typed_layout(types, R)
    grouped = typed_matmul(x, jnp.asarray(types), W, lay)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped),
                               atol=1e-5)
    # HeteroLinear accepts the layout
    from pytorch_geometric_tpu.nn.dense import HeteroLinear
    m = HeteroLinear(out_channels=C, num_types=R)
    params = m.init(jax.random.PRNGKey(0), x, jnp.asarray(types))
    o1 = m.apply(params, x, jnp.asarray(types))
    o2 = m.apply(params, x, jnp.asarray(types), typed_layout=lay)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_typed_matmul_ragged_matches_dense():
    """lax.ragged_dot path == dense einsum path (incl. empty types,
    under jit, and through HeteroLinear)."""
    import jax
    from pytorch_geometric_tpu.ops import build_ragged_layout, typed_matmul
    rng2 = np.random.default_rng(8)
    N, F, C, R = 200, 8, 12, 15
    x = jnp.asarray(rng2.normal(size=(N, F)).astype(np.float32))
    types = rng2.integers(0, R, N)
    types[types == 3] = 4          # leave type 3 empty
    W = jnp.asarray(rng2.normal(size=(R, F, C)).astype(np.float32))
    dense = typed_matmul(x, jnp.asarray(types), W)
    lay = build_ragged_layout(types, R)
    ragged = jax.jit(typed_matmul)(x, jnp.asarray(types), W, lay)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ragged),
                               atol=1e-4)
    # gradients flow through the ragged path
    g = jax.grad(lambda w: typed_matmul(x, jnp.asarray(types), w,
                                        lay).sum())(W)
    gd = jax.grad(lambda w: typed_matmul(x, jnp.asarray(types),
                                         w).sum())(W)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), atol=1e-3)
    from pytorch_geometric_tpu.nn.dense import HeteroLinear
    m = HeteroLinear(out_channels=C, num_types=R)
    params = m.init(jax.random.PRNGKey(0), x, jnp.asarray(types))
    o1 = m.apply(params, x, jnp.asarray(types))
    o2 = m.apply(params, x, jnp.asarray(types), typed_layout=lay)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)


def test_rgcn_ragged_layout_matches_dense():
    import jax
    from pytorch_geometric_tpu.nn.conv import RGCNConv
    from pytorch_geometric_tpu.ops import build_ragged_layout
    rng2 = np.random.default_rng(9)
    N, E, F, C, R = 30, 120, 8, 10, 6
    x = jnp.asarray(rng2.normal(size=(N, F)).astype(np.float32))
    coo = jnp.asarray(rng2.integers(0, N, (2, E)).astype(np.int32))
    et_np = rng2.integers(0, R, E)
    et = jnp.asarray(et_np.astype(np.int32))
    m = RGCNConv(out_channels=C, num_relations=R)
    params = m.init(jax.random.PRNGKey(0), x, coo, et)
    dense = m.apply(params, x, coo, et)
    lay = build_ragged_layout(et_np, R)
    ragged = m.apply(params, x, coo, et, typed_layout=lay)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ragged),
                               rtol=1e-4, atol=1e-5)
