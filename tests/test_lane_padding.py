"""Lane-padded narrow segment ops (r4): XLA:TPU's scatter lowering
serializes on thin trailing dims, so ops.scatter/ops.softmax pad 2-D
operands narrower than 16 to the 128-lane boundary on TPU (measured
[E,4] segment_max 67 s -> 79 ms). The padded path must be numerically
IDENTICAL — asserted against NUMPY references (comparing padded vs
unpadded jax calls would silently reuse one jit trace, since the env
branch is resolved at trace time and isn't part of the jit cache key).
PGT_FORCE_LANE_PAD exercises the padded path on the CPU test backend.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_geometric_tpu.ops import scatter, softmax

rng = np.random.default_rng(9)
E, N, H = 777, 53, 3        # odd sizes: fresh jit cache entries


@pytest.fixture()
def forced_pad(monkeypatch):
    monkeypatch.setenv('PGT_FORCE_LANE_PAD', '1')
    yield


def _np_scatter(src, idx, n, reduce, mask=None):
    src = np.asarray(src, np.float64)
    idx = np.asarray(idx)
    if mask is not None:
        keep = np.asarray(mask)
        src, idx = src[keep], idx[keep]
    out = np.zeros((n, src.shape[1]))
    if reduce in ('sum', 'mean'):
        np.add.at(out, idx, src)
        if reduce == 'mean':
            cnt = np.maximum(np.bincount(idx, minlength=n), 1)
            out = out / cnt[:, None]
    elif reduce in ('min', 'max'):
        fill = np.inf if reduce == 'min' else -np.inf
        out = np.full((n, src.shape[1]), fill)
        op = np.minimum if reduce == 'min' else np.maximum
        for i, row in zip(idx, src):
            out[i] = op(out[i], row)
        out[~np.isfinite(out).all(1) | (np.abs(out) == np.inf).any(1)] \
            = np.where(np.isfinite(out), out, 0)[
            ~np.isfinite(out).all(1) | (np.abs(out) == np.inf).any(1)]
        out = np.where(np.isfinite(out), out, 0)    # empty -> 0
    elif reduce == 'mul':
        out = np.ones((n, src.shape[1]))
        for i, row in zip(idx, src):
            out[i] *= row
    elif reduce == 'any':
        for i, row in zip(idx, src):
            out[i] = np.maximum(out[i], row)
    return out


@pytest.mark.parametrize('reduce',
                         ['sum', 'mean', 'min', 'max', 'mul', 'any'])
def test_padded_scatter_matches_numpy(forced_pad, reduce):
    src_np = rng.standard_normal((E, H)).astype(np.float32)
    if reduce == 'any':
        src_np = (src_np > 0).astype(np.float32)
    if reduce == 'mul':
        src_np = 1.0 + 0.01 * src_np       # keep products tame
    idx_np = rng.integers(0, N, E).astype(np.int32)
    out = scatter(jnp.asarray(src_np), jnp.asarray(idx_np), N, reduce)
    ref = _np_scatter(src_np, idx_np, N, reduce)
    assert out.shape == (N, H)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                               atol=1e-5)


def test_padded_scatter_with_mask_and_empty_segments(forced_pad):
    src_np = rng.standard_normal((E, 5)).astype(np.float32)
    idx_np = rng.integers(0, 10, E).astype(np.int32)   # segments 10+ empty
    mask_np = rng.random(E) < 0.7
    out = scatter(jnp.asarray(src_np), jnp.asarray(idx_np), N, 'max',
                  mask=jnp.asarray(mask_np))
    ref = _np_scatter(src_np, idx_np, N, 'max', mask=mask_np)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                               atol=1e-6)
    assert np.asarray(out)[20:].max() == 0             # empty -> 0


def test_padded_softmax_matches_numpy(forced_pad):
    src_np = rng.standard_normal((E, H)).astype(np.float32)
    idx_np = rng.integers(0, N, E).astype(np.int32)
    mask_np = rng.random(E) < 0.8
    out = np.asarray(softmax(jnp.asarray(src_np), jnp.asarray(idx_np),
                             N, mask=jnp.asarray(mask_np)))
    # numpy grouped softmax over unmasked members
    ref = np.zeros_like(src_np)
    for seg in range(N):
        sel = (idx_np == seg) & mask_np
        if sel.any():
            v = src_np[sel] - src_np[sel].max(0)
            ref[sel] = np.exp(v) / (np.exp(v).sum(0) + 1e-16)
    np.testing.assert_allclose(out[mask_np], ref[mask_np], rtol=1e-4,
                               atol=1e-5)
    assert np.abs(out[~mask_np]).max() == 0


def test_wide_operands_never_padded(forced_pad):
    from pytorch_geometric_tpu.ops.scatter import _pad_lanes
    src = jnp.ones((10, 64))
    out, w = _pad_lanes(src, 'sum')
    assert w is None and out is src
