"""Learnable-aggregation parity vs the reference PyG oracle.

Covers the weight-bearing aggregations that the behavioral suite
(``test_aggr.py``) only shape-checks: Attentional, DeepSets, Multi
(cat/sum/proj), DegreeScaler (PNA), Set2Set, Sort, GRU, LSTM, MLP.
SetTransformer/GMT/LCM/PatchTransformer/Equilibrium are intentionally
re-architected for TPU (different internal structure, see
``nn/aggr/advanced.py``) and stay behavioral-only.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.nn.aggr as RA

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.aggr as A
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(7)
N, F, DIM, L = 18, 6, 5, 8
X = rng.standard_normal((N, F)).astype(np.float32)
IDX = np.sort(rng.integers(0, DIM, N))


def t(x):
    return torch.from_numpy(np.asarray(x))


def run_ref(mod, **kw):
    mod.eval()
    with torch.no_grad():
        return mod(t(X), t(IDX).long(), dim_size=DIM, **kw).numpy()


def run_ours(mod, params_fn, ref, **kw):
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(X),
                      jnp.asarray(IDX), dim_size=DIM, **kw)
    params = params_fn(ref, params)
    return np.asarray(mod.apply(params, jnp.asarray(X), jnp.asarray(IDX),
                                dim_size=DIM, **kw))


def test_attentional():
    ref = RA.AttentionalAggregation(
        gate_nn=torch.nn.Linear(F, 1), nn=torch.nn.Linear(F, F))
    import flax.linen as fnn
    ours = A.AttentionalAggregation(gate_nn=fnn.Dense(1), nn=fnn.Dense(F))
    out = run_ours(ours, transplant, ref)
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-5, atol=1e-5)


def test_deep_sets():
    ref = RA.DeepSetsAggregation(
        local_nn=torch.nn.Linear(F, 2 * F), global_nn=torch.nn.Linear(2 * F, 3))
    import flax.linen as fnn
    ours = A.DeepSetsAggregation(local_nn=fnn.Dense(2 * F),
                                 global_nn=fnn.Dense(3))
    out = run_ours(ours, transplant, ref)
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('mode', ['cat', 'sum', 'min'])
def test_multi_modes(mode):
    ref = RA.MultiAggregation(['mean', 'max', 'sum'], mode=mode)
    ours = A.MultiAggregation(aggrs=('mean', 'max', 'sum'), mode=mode)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(IDX), dim_size=DIM)
    out = np.asarray(ours.apply(params, jnp.asarray(X), jnp.asarray(IDX),
                                dim_size=DIM))
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-5, atol=1e-5)


def test_multi_proj():
    ref = RA.MultiAggregation(['mean', 'max'], mode='proj',
                              mode_kwargs=dict(in_channels=F,
                                               out_channels=4))
    ours = A.MultiAggregation(aggrs=('mean', 'max'), mode='proj',
                              out_channels=4)
    out = run_ours(ours, lambda r, p: transplant(
        r, p, overrides={'proj.kernel': lambda sd: sd['lin.weight'].T,
                         'proj.bias': lambda sd: sd['lin.bias']}), ref)
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-5, atol=1e-5)


def test_degree_scaler():
    # deg histogram: value d appears hist[d] times (reference scaler.py:59)
    hist = torch.tensor([0, 3, 4, 2, 1])
    bins = torch.arange(5).float()
    n = int(hist.sum())
    avg_lin = float((bins * hist).sum()) / n
    avg_log = float(((bins + 1).log() * hist).sum()) / n
    ref = RA.DegreeScalerAggregation(
        aggr=['mean', 'min', 'max', 'std'],
        scaler=['identity', 'amplification', 'attenuation', 'linear',
                'inverse_linear'], deg=hist)
    ours = A.DegreeScalerAggregation(
        aggr=('mean', 'min', 'max', 'std'),
        scaler=('identity', 'amplification', 'attenuation', 'linear',
                'inverse_linear'),
        avg_deg_log=avg_log, avg_deg_lin=avg_lin)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(IDX), dim_size=DIM)
    out = np.asarray(ours.apply(params, jnp.asarray(X), jnp.asarray(IDX),
                                dim_size=DIM))
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-4, atol=1e-4)


def _lstm_overrides(prefix, w_ih, w_hh, b_ih, b_hh, H):
    """torch LSTM chunk order i,f,g,o -> flax per-gate denses."""
    ov = {}
    for k, g in enumerate('ifgo'):
        sl = slice(k * H, (k + 1) * H)
        ov[f'{prefix}.i{g}.kernel'] = w_ih[sl].T
        ov[f'{prefix}.h{g}.kernel'] = w_hh[sl].T
        ov[f'{prefix}.h{g}.bias'] = b_ih[sl] + b_hh[sl]
    return ov


def test_set2set():
    ref = RA.Set2Set(F, processing_steps=3)
    ours = A.Set2Set(in_channels=F, processing_steps=3)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ov = _lstm_overrides('lstm', sd['lstm.weight_ih_l0'],
                         sd['lstm.weight_hh_l0'], sd['lstm.bias_ih_l0'],
                         sd['lstm.bias_hh_l0'], F)
    out = run_ours(ours, lambda r, p: transplant(r, p, overrides=ov), ref)
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-4, atol=1e-4)


def test_sort():
    ref = RA.SortAggregation(k=3)
    ours = A.SortAggregation(k=3)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(IDX), dim_size=DIM, max_num_elements=L)
    out = np.asarray(ours.apply(params, jnp.asarray(X), jnp.asarray(IDX),
                                dim_size=DIM, max_num_elements=L))
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-5, atol=1e-5)


def test_gru():
    H = 4
    ref = RA.GRUAggregation(F, H)
    ours = A.GRUAggregation(in_channels=F, out_channels=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    w_ih, w_hh = sd['gru.weight_ih_l0'], sd['gru.weight_hh_l0']
    b_ih, b_hh = sd['gru.bias_ih_l0'], sd['gru.bias_hh_l0']
    ov = {}
    for k, g in enumerate(['r', 'z', 'n']):
        sl = slice(k * H, (k + 1) * H)
        ov[f'gru.i{g}.kernel'] = w_ih[sl].T
        ov[f'gru.h{g}.kernel'] = w_hh[sl].T
        if g == 'n':
            # torch: tanh(W_in x + b_in + r*(W_hn h + b_hn)) — flax 'in'
            # dense carries b_in, 'hn' dense carries b_hn
            ov['gru.in.bias'] = b_ih[sl]
            ov['gru.hn.bias'] = b_hh[sl]
        else:
            ov[f'gru.i{g}.bias'] = b_ih[sl] + b_hh[sl]
    out = run_ours(ours, lambda r, p: transplant(r, p, overrides=ov), ref,
                   max_num_elements=L)
    np.testing.assert_allclose(out, run_ref(ref, max_num_elements=L),
                               rtol=1e-4, atol=1e-4)


def test_lstm():
    H = 4
    ref = RA.LSTMAggregation(F, H)
    ours = A.LSTMAggregation(in_channels=F, out_channels=H)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ov = _lstm_overrides('lstm', sd['lstm.weight_ih_l0'],
                         sd['lstm.weight_hh_l0'], sd['lstm.bias_ih_l0'],
                         sd['lstm.bias_hh_l0'], H)
    out = run_ours(ours, lambda r, p: transplant(r, p, overrides=ov), ref,
                   max_num_elements=L)
    np.testing.assert_allclose(out, run_ref(ref, max_num_elements=L),
                               rtol=1e-4, atol=1e-4)


def test_mlp():
    # reference bakes max_num_elements at __init__ (forward rejects it)
    ref = RA.MLPAggregation(F, 3, max_num_elements=L, num_layers=1)
    ours = A.MLPAggregation(out_channels=3, max_num_elements_static=L)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    [wkey] = [k for k in sd if k.endswith('.weight')]
    [bkey] = [k for k in sd if k.endswith('.bias')]
    ov = {'mlp.kernel': sd[wkey].T, 'mlp.bias': sd[bkey]}
    out = run_ours(ours, lambda r, p: transplant(r, p, overrides=ov), ref,
                   max_num_elements=L)
    np.testing.assert_allclose(out, run_ref(ref), rtol=1e-4, atol=1e-4)
