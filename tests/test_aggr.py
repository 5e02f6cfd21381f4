"""Aggregation package tests (mirrors reference test/nn/aggr/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as fnn
from pytorch_geometric_tpu.nn import aggr as A


X = jnp.asarray(np.random.default_rng(0).standard_normal((6, 4))
                .astype(np.float32))
INDEX = jnp.asarray(np.array([0, 0, 1, 1, 1, 2], np.int32))


def run(mod, **kw):
    params = mod.init(jax.random.PRNGKey(0), X, INDEX, 3, **kw)
    return mod.apply(params, X, INDEX, 3, **kw)


def test_basic_aggrs():
    x = np.asarray(X)
    out = run(A.SumAggregation())
    np.testing.assert_allclose(out[0], x[:2].sum(0), rtol=1e-5)
    out = run(A.MeanAggregation())
    np.testing.assert_allclose(out[1], x[2:5].mean(0), rtol=1e-5)
    out = run(A.MaxAggregation())
    np.testing.assert_allclose(out[2], x[5], rtol=1e-5)
    out = run(A.MinAggregation())
    np.testing.assert_allclose(out[1], x[2:5].min(0), rtol=1e-5)
    out = run(A.VarAggregation())
    np.testing.assert_allclose(out[1], x[2:5].var(0), rtol=1e-4,
                               atol=1e-5)
    out = run(A.StdAggregation())
    np.testing.assert_allclose(out[1], np.sqrt(x[2:5].var(0) + 1e-5),
                               rtol=1e-4, atol=1e-4)


def test_mask_drops_rows():
    mask = jnp.asarray([True, False, True, True, True, True])
    mod = A.SumAggregation()
    params = mod.init(jax.random.PRNGKey(0), X, INDEX, 3)
    out = mod.apply(params, X, INDEX, 3, mask=mask)
    np.testing.assert_allclose(out[0], np.asarray(X)[0], rtol=1e-5)


def test_softmax_powermean_learnable():
    for mod in (A.SoftmaxAggregation(learn=True),
                A.PowerMeanAggregation(learn=True, p=1.0)):
        params = mod.init(jax.random.PRNGKey(0), X, INDEX, 3)
        out = mod.apply(params, X, INDEX, 3)
        assert out.shape == (3, 4)
        assert np.isfinite(np.asarray(out)).all()


def test_variance_preserving():
    out = run(A.VariancePreservingAggregation())
    x = np.asarray(X)
    np.testing.assert_allclose(out[1], x[2:5].sum(0) / np.sqrt(3),
                               rtol=1e-5)


def test_multi_and_resolver():
    out = run(A.MultiAggregation(aggrs=('mean', 'max')))
    assert out.shape == (3, 8)
    out = run(A.MultiAggregation(aggrs=('mean', 'max'), mode='sum'))
    assert out.shape == (3, 4)
    assert isinstance(A.aggregation_resolver('mean'), A.MeanAggregation)


def test_degree_scaler():
    out = run(A.DegreeScalerAggregation(aggr=('mean', 'max')))
    assert out.shape == (3, 4 * 2 * 3)


def test_attentional():
    mod = A.AttentionalAggregation(gate_nn=fnn.Dense(1))
    out = run(mod)
    assert out.shape == (3, 4)
    # weights sum to 1 within each segment -> output is convex combination
    x = np.asarray(X)
    assert (np.asarray(out[2]) == pytest.approx(x[5], rel=1e-5))


def test_set2set_and_sort():
    out = run(A.Set2Set(processing_steps=2))
    assert out.shape == (3, 8)
    out = run(A.SortAggregation(k=3))
    assert out.shape == (3, 12)


def test_quantile_median():
    x = jnp.asarray(np.array([[3.], [1.], [2.], [5.], [4.], [9.]],
                             np.float32))
    mod = A.MedianAggregation()
    params = mod.init(jax.random.PRNGKey(0), x, INDEX, 3)
    out = np.asarray(mod.apply(params, x, INDEX, 3))
    assert out[0, 0] == 1.0   # median(3,1) lower -> 1
    assert out[1, 0] == 4.0   # median(2,5,4) -> 4
    assert out[2, 0] == 9.0


def test_recurrent_and_mlp():
    out = run(A.GRUAggregation(), max_num_elements=6)
    assert out.shape == (3, 4)
    out = run(A.LSTMAggregation(), max_num_elements=6)
    assert out.shape == (3, 4)
    out = run(A.MLPAggregation(out_channels=5), max_num_elements=6)
    assert out.shape == (3, 5)


def test_deep_sets():
    mod = A.DeepSetsAggregation(local_nn=fnn.Dense(8),
                                global_nn=fnn.Dense(2))
    out = run(mod)
    assert out.shape == (3, 2)
