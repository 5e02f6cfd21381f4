"""Normalisation-layer parity vs the reference PyG oracle (eval-mode
statistics, transplanted affine parameters)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.nn as RN

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.norm as N
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(7)
NN_, F = 18, 6
X = rng.standard_normal((NN_, F)).astype(np.float32)
BATCH = np.sort(rng.integers(0, 3, NN_))


def t(x):
    return torch.from_numpy(np.asarray(x))


def run_pair(ref, ours, *args, overrides=None, atol=1e-4,
             init_extra=(), **kw):
    ref = ref.eval() if hasattr(ref, 'eval') else ref
    with torch.no_grad():
        ref_out = ref(*[t(a) for a in args]).numpy()
    jargs = [jnp.asarray(a) for a in args]
    params = ours.init(jax.random.PRNGKey(0), *jargs, **kw)
    params = transplant(ref, params, overrides)
    got = ours.apply(params, *jargs, **kw)
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=atol,
                               rtol=1e-4)


def test_batch_norm():
    ref = RN.BatchNorm(F)
    # push running stats away from the identity
    ref.train()
    with torch.no_grad():
        ref(t(rng.standard_normal((50, F)).astype(np.float32) * 2 + 1))
    ref = ref.eval()
    with torch.no_grad():
        ref_out = ref(t(X)).numpy()
    ours = N.BatchNorm(in_channels=F)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        'params': {'bn': {'scale': jnp.asarray(sd['module.weight']),
                          'bias': jnp.asarray(sd['module.bias'])}},
        'batch_stats': {'bn': {
            'mean': jnp.asarray(sd['module.running_mean']),
            'var': jnp.asarray(sd['module.running_var'])}},
    }
    got = ours.apply(params, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-4,
                               rtol=1e-4)


def test_layer_norm_modes():
    for mode in ('graph', 'node'):
        ref = RN.LayerNorm(F, mode=mode).eval()
        ours = N.LayerNorm(in_channels=F, mode=mode)
        with torch.no_grad():
            ref_out = ref(t(X), batch=t(BATCH)).numpy()
        params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                           batch=jnp.asarray(BATCH), batch_size=3)
        params = transplant(ref, params,
                            {'ln.scale': lambda sd: sd['weight'],
                             'ln.bias': lambda sd: sd['bias']})
        got = ours.apply(params, jnp.asarray(X),
                         batch=jnp.asarray(BATCH), batch_size=3)
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-4,
                                   rtol=1e-4, err_msg=mode)


def test_graph_norm():
    ref = RN.GraphNorm(F).eval()
    ours = N.GraphNorm(in_channels=F)
    with torch.no_grad():
        ref_out = ref(t(X), batch=t(BATCH)).numpy()
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       batch=jnp.asarray(BATCH), batch_size=3)
    params = transplant(ref, params,
                        {'scale': lambda sd: sd['weight'],
                         'bias': lambda sd: sd['bias'],
                         'mean_scale': lambda sd: sd['mean_scale']})
    got = ours.apply(params, jnp.asarray(X), batch=jnp.asarray(BATCH),
                     batch_size=3)
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-4,
                               rtol=1e-4)


def test_pair_mean_size_norms():
    ref_out = RN.PairNorm()(t(X)).numpy()
    got = N.PairNorm()(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-4)

    ref_out = RN.MeanSubtractionNorm()(t(X)).numpy()
    got = N.MeanSubtractionNorm()(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-5)

    ref_out = RN.GraphSizeNorm()(t(X), t(BATCH)).numpy()
    got = N.GraphSizeNorm()(jnp.asarray(X), jnp.asarray(BATCH),
                            batch_size=3)
    np.testing.assert_allclose(np.asarray(got), ref_out, atol=1e-5)
