"""int8 quantized inference cache (fill_cache(cache_dtype=int8)).

Two-sided factorization A ~= diag(r) Q diag(c) with int8 Q: one stored
copy serves A x and A^T x. Inference-only (no gradients).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.ops import spmm

N, E, F = 400, 3000, 32
rng = np.random.default_rng(0)
COO = rng.integers(0, N, (2, E)).astype(np.int32)
X = rng.standard_normal((N, F)).astype(np.float32)


def _gcn_w():
    deg = np.bincount(COO[1], minlength=N).astype(np.float32)
    dinv = 1 / np.sqrt(np.maximum(deg, 1))
    return (dinv[COO[0]] * dinv[COO[1]]).astype(np.float32)


@pytest.mark.parametrize('weights', ['uniform', 'gcn'])
@pytest.mark.parametrize('kw', [{}, {'transpose': True},
                                {'reduce': 'mean'}])
def test_int8_matches_f32(weights, kw):
    w = (rng.random(E).astype(np.float32) if weights == 'uniform'
         else _gcn_w())
    ei32 = EdgeIndex(COO, (N, N)).fill_cache(dense_weight=w)
    ei8 = EdgeIndex(COO, (N, N)).fill_cache(dense_weight=w,
                                            cache_dtype=jnp.int8)
    assert ei8.dense_adj.dtype == jnp.int8
    a = np.asarray(spmm(ei32, jnp.asarray(X), **kw))
    b = np.asarray(spmm(ei8, jnp.asarray(X), **kw))
    rel = np.abs(b - a).max() / np.abs(a).max()
    assert rel < 0.03, rel


def test_int8_flows_through_jit_pytree():
    w = _gcn_w()
    ei8 = EdgeIndex(COO, (N, N)).fill_cache(dense_weight=w,
                                            cache_dtype=jnp.int8)

    @jax.jit
    def f(ei, x):
        return spmm(ei, x)

    out = f(ei8, jnp.asarray(X))
    ref = spmm(ei8, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_int8_gcn_inference_argmax_agreement():
    """Quantized inference of a TRAINED 2-layer GCN predicts the same
    classes as f32 on >=99% of nodes (the deployment acceptance
    criterion). Training runs on the f32 cache; only serving switches
    to int8."""
    import optax
    from pytorch_geometric_tpu.nn.models import GCN
    # learnable homophilous task (class-separable features AND
    # mostly same-class edges): deployment models are confident,
    # which is what the argmax criterion measures
    r2 = np.random.default_rng(7)
    y_np = r2.integers(0, 7, N).astype(np.int32)
    centers = r2.standard_normal((7, F)).astype(np.float32) * 2.0
    x_sep = jnp.asarray(centers[y_np]
                        + r2.standard_normal((N, F)).astype(np.float32))
    y = jnp.asarray(y_np)
    order = np.argsort(y_np, kind='stable')
    srcs = r2.integers(0, N, E)
    near = np.clip(srcs + r2.integers(-8, 9, E), 0, N - 1)
    coo_h = np.stack([order[srcs], order[near]]).astype(np.int32)
    deg = np.bincount(coo_h[1], minlength=N).astype(np.float32)
    dinv = 1 / np.sqrt(np.maximum(deg, 1))
    w = (dinv[coo_h[0]] * dinv[coo_h[1]]).astype(np.float32)
    ei32 = EdgeIndex(coo_h, (N, N)).fill_cache(dense_weight=w)
    ei8 = EdgeIndex(coo_h, (N, N)).fill_cache(dense_weight=w,
                                              cache_dtype=jnp.int8)
    model = GCN(hidden_channels=32, num_layers=2, out_channels=7,
                conv_kwargs={'normalize': False,
                             'add_self_loops': False})
    params = model.init(jax.random.PRNGKey(0), x_sep, ei32)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, x_sep, ei32)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    for _ in range(150):
        params, opt, loss = step(params, opt)
    p32 = np.asarray(model.apply(params, x_sep, ei32))
    p8 = np.asarray(model.apply(params, x_sep, ei8))
    agree = (p32.argmax(-1) == p8.argmax(-1)).mean()
    assert agree >= 0.99, agree


def test_int8_scales_zero_on_empty_rows_cols():
    # node N-1 isolated: its row/col scales must be 0 (a nonzero guard
    # would poison the dynamic x quantization)
    coo = np.stack([np.arange(10), (np.arange(10) + 1) % 10]) \
        .astype(np.int32)
    ei8 = EdgeIndex(coo, (12, 12)).fill_cache(
        dense_weight=np.ones(10, np.float32), cache_dtype=jnp.int8)
    r, c = [np.asarray(t) for t in ei8.dense_scale]
    assert r[11] == 0 and c[11] == 0
    out = np.asarray(spmm(ei8, jnp.asarray(
        np.ones((12, 4), np.float32))))
    assert np.allclose(out[10:], 0)
    assert np.allclose(out[:10], 1, atol=0.05)
