"""Dense-adjacency SpMM dispatch (ops/spmm.py::_dense_spmm).

On TPU the dense [N, N] @ [N, F] matmul runs ~11x closer to the HBM
roofline than the gather+scatter path (profiled on v5e), so spmm routes
through it when the adjacency fits the entry budget. These tests pin
numerical parity (fwd, grad_x, grad_w, mean reduce, padded edges)
against the scatter reference.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.ops.spmm import _dense_profitable, spmm

N, E, F = 300, 2000, 8


@pytest.fixture
def graph():
    rng = np.random.default_rng(0)
    coo = rng.integers(0, N, (2, E)).astype(np.int32)
    coo_p = np.concatenate([coo, np.full((2, 10), N, np.int32)], 1)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(E + 10).astype(np.float32))
    return coo, EdgeIndex(coo_p, (N, N)), x, w


def _no_dense():
    os.environ['PGT_DISABLE_DENSE_SPMM'] = '1'


@pytest.fixture(autouse=True)
def _cleanup():
    # tests run on the CPU backend, where the dense path is gated off by
    # default — force it on so these tests exercise the real dispatch
    os.environ['PGT_FORCE_DENSE_SPMM'] = '1'
    yield
    os.environ.pop('PGT_DISABLE_DENSE_SPMM', None)
    os.environ.pop('PGT_FORCE_DENSE_SPMM', None)


def test_dense_dispatch_active(graph):
    _, ei, x, _ = graph
    assert _dense_profitable(ei, x)


def test_dense_fwd_matches_scatter(graph):
    coo, ei, x, w = graph
    ref = jax.ops.segment_sum(x[coo[0]] * np.asarray(w)[:E, None],
                              coo[1], N)
    np.testing.assert_allclose(np.asarray(spmm(ei, x, w)),
                               np.asarray(ref), atol=2e-5)


def test_dense_grads_match_scatter(graph):
    _, ei, x, w = graph

    def f(x, w):
        return (spmm(ei, x, w) ** 2).sum()

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    _no_dense()
    gx2, gw2 = jax.grad(f, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2),
                               atol=1e-3)


def test_dense_mean_matches(graph):
    _, ei, x, _ = graph
    om = spmm(ei, x, None, reduce='mean')
    _no_dense()
    om2 = spmm(ei, x, None, reduce='mean')
    np.testing.assert_allclose(np.asarray(om), np.asarray(om2),
                               atol=2e-5)


def test_dense_not_profitable_when_sparse():
    # 100k nodes, 1k edges, F=4: 1e10 entries >> 36*E*F
    coo = np.stack([np.arange(1000), np.arange(1000)]).astype(np.int32)
    ei = EdgeIndex(coo, (100_000, 100_000))
    x = jnp.zeros((100_000, 4))
    assert not _dense_profitable(ei, x)


def test_dense_cache_bf16_storage():
    """bf16-stored cached adjacency: half the HBM stream, ~1e-2 rel
    error vs the f32 build, f32 accumulation/output."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pytorch_geometric_tpu import EdgeIndex

    rng = np.random.default_rng(0)
    n, e, f = 300, 2500, 32
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    from pytorch_geometric_tpu.ops import spmm
    ei32 = EdgeIndex(coo, (n, n)).fill_cache(dense_weight=w)
    ei16 = EdgeIndex(coo, (n, n)).fill_cache(dense_weight=w,
                                             cache_dtype=jnp.bfloat16)
    assert ei16.dense_adj.dtype == jnp.bfloat16
    ref = np.asarray(spmm(ei32, x))
    out = np.asarray(spmm(ei16, x))
    assert out.dtype == np.float32
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 2e-2

    g = jax.grad(lambda xx: (spmm(ei16, xx) ** 2).sum())(x)
    gref = jax.grad(lambda xx: (spmm(ei32, xx) ** 2).sum())(x)
    assert np.abs(np.asarray(g) - np.asarray(gref)).max() / \
        np.abs(np.asarray(gref)).max() < 3e-2
