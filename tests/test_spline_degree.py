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


def test_spline_basis_arbitrary_degree():
    """Degrees beyond 3 (the pyg-lib runtime-degree boundary): partition
    of unity and agreement with the explicit cubic form."""
    import jax.numpy as jnp
    import numpy as np
    from pytorch_geometric_tpu.nn.conv.kernel_conv import _bspline_basis

    rng = np.random.default_rng(0)
    pseudo = jnp.asarray(rng.random((50, 2)).astype(np.float32))
    for deg in (1, 2, 3, 4, 5):
        w, idx = _bspline_basis(pseudo, kernel_size=deg + 4, degree=deg)
        assert w.shape == (50, 2, deg + 1)
        # cardinal B-spline taps sum to 1 (before boundary clipping)
        s = np.asarray(w.sum(-1))
        interior = np.asarray(idx.max(-1) < deg + 4 - 0)
        np.testing.assert_allclose(s, np.ones_like(s), rtol=0, atol=1e-5)

    # recursion reproduces the explicit cubic polynomials
    f = jnp.asarray(rng.random((40, 1)).astype(np.float32))
    w3, _ = _bspline_basis(f, kernel_size=8, degree=3)
    k = 8 - 3
    v = np.asarray(jnp.clip(f, 0, 1) * k)
    fr = v - np.minimum(np.floor(v), k - 1)
    f2, f3 = fr * fr, fr ** 3
    expl = np.concatenate([(1 - fr) ** 3 / 6, (3 * f3 - 6 * f2 + 4) / 6,
                           (-3 * f3 + 3 * f2 + 3 * fr + 1) / 6, f3 / 6],
                          -1)
    np.testing.assert_allclose(np.asarray(w3)[:, 0], expl, atol=1e-5)
