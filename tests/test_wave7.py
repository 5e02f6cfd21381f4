"""XConv, SGFormer/Polynormer/GraphMixer smoke + learnability."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu.nn as pgnn
from pytorch_geometric_tpu.nn.models import (SGFormer, Polynormer,
                                             GraphMixer)

rng = np.random.default_rng(0)
N = 16
X = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))
POS = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
COO = jnp.asarray(np.stack([rng.integers(0, N, 48),
                            rng.integers(0, N, 48)]).astype(np.int32))


def test_xconv():
    mod = pgnn.XConv(out_channels=12, kernel_size=4, dilation=2)
    params = mod.init(jax.random.PRNGKey(0), X, POS)
    out = mod.apply(params, X, POS)
    assert out.shape == (N, 12)
    assert np.isfinite(np.asarray(out)).all()
    # no-feature variant (pure point cloud)
    params = mod.init(jax.random.PRNGKey(0), None, POS)
    out = mod.apply(params, None, POS)
    assert out.shape == (N, 12)


def test_sgformer_polynormer_learn():
    y = jnp.asarray(rng.integers(0, 3, N))
    for cls in (SGFormer, Polynormer):
        model = cls(hidden_channels=16, out_channels=3)
        p = model.init(jax.random.PRNGKey(0), X, COO)
        tx = optax.adam(1e-2)
        opt = tx.init(p)

        @jax.jit
        def step(p, opt):
            def lf(p):
                lg = model.apply(p, X, COO)
                return optax.softmax_cross_entropy_with_integer_labels(
                    lg, y).mean()
            l, g = jax.value_and_grad(lf)(p)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(p, up), opt, l

        l0 = None
        for _ in range(120):
            p, opt, l = step(p, opt)
            l0 = l0 or float(l)
        assert float(l) < l0 * 0.5, (cls.__name__, l0, float(l))


def test_graph_mixer():
    lf = jnp.asarray(rng.standard_normal((N, 6, 4)).astype(np.float32))
    lt = jnp.asarray(rng.random((N, 6)).astype(np.float32))
    lm = jnp.asarray(rng.random((N, 6)) < 0.8)
    mod = GraphMixer(in_channels=4, hidden_channels=16, out_channels=4,
                     num_tokens=6)
    p = mod.init(jax.random.PRNGKey(0), lf, lt, lm)
    out = mod.apply(p, lf, lt, lm)
    assert out.shape == (N, 4)
    # fully-masked rows yield finite output
    lm0 = jnp.zeros_like(lm)
    out = mod.apply(p, lf, lt, lm0)
    assert np.isfinite(np.asarray(out)).all()
