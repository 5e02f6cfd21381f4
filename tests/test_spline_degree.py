"""Arbitrary-degree open B-spline basis (reference boundary:
pyg-lib ``spline_basis``/``spline_weighting``, torch-spline-conv
``basis_cpu.cpp`` polynomials; ``spline_conv.py:16``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.nn.conv.kernel_conv import (SplineConv,
                                                       _bspline_basis)

rng = np.random.default_rng(5)


def _oracle_basis(pseudo, K, m):
    """numpy replica of torch-spline-conv's open-spline basis."""
    v = np.clip(pseudo, 0, 1) * max(K - m, 1)
    lo = np.minimum(np.floor(v).astype(np.int64), max(K - m - 1, 0))
    f = v - lo
    if m == 1:
        ws = [1 - f, f]
    elif m == 2:
        ws = [0.5 * f * f - f + 0.5, -f * f + f + 0.5, 0.5 * f * f]
    elif m == 3:
        ws = [(1 - f) ** 3 / 6, (3 * f ** 3 - 6 * f * f + 4) / 6,
              (-3 * f ** 3 + 3 * f * f + 3 * f + 1) / 6, f ** 3 / 6]
    w = np.stack(ws, -1)
    idx = lo[..., None] + np.arange(m + 1)
    w = np.where(idx < K, w, 0.0)
    return w, np.minimum(idx, K - 1)


@pytest.mark.parametrize('degree', [1, 2, 3])
@pytest.mark.parametrize('K', [4, 5])
def test_basis_matches_oracle(degree, K):
    pseudo = rng.random((40, 2)).astype(np.float32)
    w, idx = _bspline_basis(jnp.asarray(pseudo), K, degree)
    w_np, idx_np = _oracle_basis(pseudo, K, degree)
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), idx_np)


@pytest.mark.parametrize('degree', [1, 2, 3])
def test_basis_partition_of_unity(degree):
    # B-spline bases sum to 1 everywhere inside the domain
    pseudo = rng.random((100, 3)).astype(np.float32) * 0.999
    w, _ = _bspline_basis(jnp.asarray(pseudo), 6, degree)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-4)


@pytest.mark.parametrize('degree', [2, 3])
def test_spline_conv_higher_degree(degree):
    n, e = 12, 40
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    coo = jnp.asarray(np.stack([rng.integers(0, n, e),
                                rng.integers(0, n, e)]).astype(np.int32))
    ea = jnp.asarray(rng.random((e, 2)).astype(np.float32))
    m = SplineConv(out_channels=6, dim=2, kernel_size=4, degree=degree)
    p = m.init(jax.random.PRNGKey(0), x, coo, ea)
    out = m.apply(p, x, coo, ea)
    assert out.shape == (n, 6)
    assert bool(jnp.isfinite(out).all())
    # gradient flows through the basis
    g = jax.grad(lambda z: (m.apply(p, z, coo, ea) ** 2).sum())(x)
    assert bool(jnp.isfinite(g).all())
