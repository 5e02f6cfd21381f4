"""Tests for fused sampled binary ops (ops/sampled.py) and the
debug-mode edge_index bounds check (reference
``message_passing.py:269-290`` actionable-error parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.experimental import debug
from pytorch_geometric_tpu.ops import (sampled_add, sampled_div,
                                       sampled_mul, sampled_sub)

rng = np.random.default_rng(0)


def test_sampled_ops_match_gather_compose():
    l = jnp.asarray(rng.standard_normal((10, 4)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((12, 4)).astype(np.float32) + 3)
    li = jnp.asarray(rng.integers(0, 10, 20))
    ri = jnp.asarray(rng.integers(0, 12, 20))
    np.testing.assert_allclose(sampled_add(l, r, li, ri),
                               l[li] + r[ri], rtol=1e-6)
    np.testing.assert_allclose(sampled_sub(l, r, li, ri),
                               l[li] - r[ri], rtol=1e-6)
    np.testing.assert_allclose(sampled_mul(l, r, li, ri),
                               l[li] * r[ri], rtol=1e-6)
    np.testing.assert_allclose(sampled_div(l, r, li, ri),
                               l[li] / r[ri], rtol=1e-6)


def test_sampled_ops_none_index_and_padding():
    l = jnp.asarray(np.ones((4, 2), np.float32) * 6)
    r = jnp.asarray(np.ones((4, 2), np.float32) * 2)
    # None index = all rows
    np.testing.assert_allclose(sampled_div(l, r), np.full((4, 2), 3.0))
    # out-of-range (pad) indices produce the op identity, never garbage
    li = jnp.asarray(np.array([0, 99]))
    ri = jnp.asarray(np.array([99, 1]))
    out = sampled_mul(l, r, li, ri)
    np.testing.assert_allclose(out, [[6., 6.], [2., 2.]])
    out = sampled_add(l, r, li, ri)
    np.testing.assert_allclose(out, [[6., 6.], [2., 2.]])


def test_sampled_ops_grad():
    l = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((6, 3)).astype(np.float32))
    li = jnp.asarray(np.array([0, 1, 5, 5]))

    def f(l, r):
        return (sampled_mul(l, r, li, li) ** 2).sum()

    gl, gr = jax.grad(f, argnums=(0, 1))(l, r)
    assert np.all(np.isfinite(np.asarray(gl)))
    assert float(jnp.abs(gl[2:5]).sum()) == 0  # unreferenced rows


def test_debug_bounds_check_raises():
    x = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    conv = pgt.nn.GCNConv(out_channels=4)
    good = jnp.asarray(np.array([[0, 1, 2], [1, 2, 3]], np.int32))
    params = conv.init(jax.random.PRNGKey(0), x, good)
    corrupt = jnp.asarray(np.array([[0, 1, 99], [1, 2, 3]], np.int32))
    neg = jnp.asarray(np.array([[0, 1, -2], [1, 2, 3]], np.int32))
    # without debug: silently clamped (padding semantics)
    conv.apply(params, x, corrupt)
    with debug():
        with pytest.raises(IndexError, match='larger than'):
            conv.apply(params, x, corrupt)
        with pytest.raises(IndexError, match='negative'):
            conv.apply(params, x, neg)
        # pad sentinel (== num_nodes) stays legal under debug
        pad = jnp.asarray(np.array([[0, 1, 8], [1, 2, 8]], np.int32))
        conv.apply(params, x, pad)
        # and clean input passes
        conv.apply(params, x, good)


def test_debug_bounds_check_inside_jit_is_noop():
    """Tracers cannot be validated host-side; jit still works in debug."""
    x = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    conv = pgt.nn.GCNConv(out_channels=4)
    ei = jnp.asarray(np.array([[0, 1, 2], [1, 2, 3]], np.int32))
    params = conv.init(jax.random.PRNGKey(0), x, ei)
    with debug():
        out = jax.jit(lambda p, x, e: conv.apply(p, x, e))(params, x, ei)
    assert np.all(np.isfinite(np.asarray(out)))
