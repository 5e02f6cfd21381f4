"""Aggregation + dense-pooling parity vs the reference PyG oracle."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.nn.aggr as RA
from torch_geometric.nn import (dense_diff_pool as ref_diff_pool,
                                dense_mincut_pool as ref_mincut_pool)

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.aggr as A
from pytorch_geometric_tpu.nn.dense import (dense_diff_pool,
                                            dense_mincut_pool)
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(5)
N, F = 20, 6
X = rng.standard_normal((N, F)).astype(np.float32)
IDX = np.sort(rng.integers(0, 5, N))
DIM = 5


def t(x):
    return torch.from_numpy(np.asarray(x))


def run_ref(mod):
    with torch.no_grad():
        return mod(t(X), t(IDX), dim_size=DIM).numpy()


def run_ours(mod, params=None):
    if params is None:
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(X),
                          jnp.asarray(IDX), dim_size=DIM)
    return np.asarray(mod.apply(params, jnp.asarray(X),
                                jnp.asarray(IDX), dim_size=DIM)), params


@pytest.mark.parametrize('name', [
    'SumAggregation', 'MeanAggregation', 'MaxAggregation',
    'MinAggregation', 'MulAggregation', 'VarAggregation',
    'StdAggregation', 'MedianAggregation',
    'VariancePreservingAggregation'])
def test_parameter_free_aggr(name):
    ref_out = run_ref(getattr(RA, name)())
    ours = getattr(A, name)()
    if hasattr(ours, 'init'):
        out, _ = run_ours(ours)
    else:
        out = np.asarray(ours(jnp.asarray(X), jnp.asarray(IDX),
                              dim_size=DIM))
    # padding convention: empty segments may be 0 instead of +-inf
    finite = np.isfinite(ref_out)
    np.testing.assert_allclose(out[finite], ref_out[finite], rtol=1e-4,
                               atol=1e-5)


def test_quantile_aggr():
    for q in (0.25, 0.5, 0.75):
        ref_out = run_ref(RA.QuantileAggregation(q=q))
        ours = A.QuantileAggregation(q=q)
        out = (run_ours(ours)[0] if hasattr(ours, 'init')
               else np.asarray(ours(jnp.asarray(X), jnp.asarray(IDX),
                                    dim_size=DIM)))
        finite = np.isfinite(ref_out)
        np.testing.assert_allclose(out[finite], ref_out[finite],
                                   rtol=1e-4, atol=1e-5, err_msg=str(q))


def test_softmax_powermean_aggr():
    # fixed (non-learned) variants are deterministic
    ref_out = run_ref(RA.SoftmaxAggregation(t=0.5, learn=False))
    ours = A.SoftmaxAggregation(t=0.5, learn=False)
    out, _ = run_ours(ours)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)

    xp = np.abs(X) + 0.1   # powermean needs positive inputs
    ref = RA.PowerMeanAggregation(p=2.0, learn=False)
    with torch.no_grad():
        ref_out = ref(t(xp), t(IDX), dim_size=DIM).numpy()
    ours = A.PowerMeanAggregation(p=2.0, learn=False)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(xp),
                       jnp.asarray(IDX), dim_size=DIM)
    out = np.asarray(ours.apply(params, jnp.asarray(xp),
                                jnp.asarray(IDX), dim_size=DIM))
    finite = np.isfinite(ref_out)
    np.testing.assert_allclose(out[finite], ref_out[finite], rtol=1e-3,
                               atol=1e-4)


def test_dense_diff_mincut_pool():
    B, NN, C = 2, 8, 3
    x = rng.standard_normal((B, NN, F)).astype(np.float32)
    adj = (rng.random((B, NN, NN)) < 0.4).astype(np.float32)
    s = rng.standard_normal((B, NN, C)).astype(np.float32)
    mask = np.ones((B, NN), bool)
    mask[1, 6:] = False

    r_out, r_adj, r_l1, r_l2 = ref_diff_pool(t(x), t(adj), t(s),
                                             t(mask))
    o_out, o_adj, o_l1, o_l2 = dense_diff_pool(
        jnp.asarray(x), jnp.asarray(adj), jnp.asarray(s),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(o_out), r_out.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_adj), r_adj.numpy(),
                               atol=1e-4)
    assert abs(float(o_l1) - float(r_l1)) < 1e-4
    assert abs(float(o_l2) - float(r_l2)) < 1e-4

    r_out, r_adj, r_l1, r_l2 = ref_mincut_pool(t(x), t(adj), t(s),
                                               t(mask))
    o_out, o_adj, o_l1, o_l2 = dense_mincut_pool(
        jnp.asarray(x), jnp.asarray(adj), jnp.asarray(s),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(o_out), r_out.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_adj), r_adj.numpy(),
                               atol=1e-4)
    assert abs(float(o_l1) - float(r_l1)) < 1e-4
    assert abs(float(o_l2) - float(r_l2)) < 1e-4
