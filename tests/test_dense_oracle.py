"""Dense-subpackage parity vs the reference PyG oracle: padded-batch
convolutions, HeteroLinear/HeteroDictLinear, DMoNPooling."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.nn.dense as td

import flax.linen as fnn
import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.dense as pd
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(30)
B, N, F, C = 2, 10, 6, 8
X = rng.standard_normal((B, N, F)).astype(np.float32)
ADJ = (rng.random((B, N, N)) < 0.3).astype(np.float32)
MASK = rng.random((B, N)) < 0.8


def t(x):
    return torch.from_numpy(np.asarray(x))


def _run(ref, ours, overrides=None, args=None, jargs=None, rtol=1e-4):
    with torch.no_grad():
        r = ref(*args)
    params = ours.init(jax.random.PRNGKey(0), *jargs)
    params = transplant(ref, params, overrides or {})
    g = ours.apply(params, *jargs)
    np.testing.assert_allclose(np.asarray(g), r.numpy(), rtol=rtol,
                               atol=1e-4)


def test_dense_gcn():
    for improved in (False, True):
        ref = td.DenseGCNConv(F, C, improved=improved)
        ours = pd.DenseGCNConv(out_channels=C, improved=improved)
        _run(ref, ours, args=(t(X), t(ADJ), t(MASK)),
             jargs=(jnp.asarray(X), jnp.asarray(ADJ), jnp.asarray(MASK)))


def test_dense_sage():
    for normalize in (False, True):
        ref = td.DenseSAGEConv(F, C, normalize=normalize)
        ours = pd.DenseSAGEConv(out_channels=C, normalize=normalize)
        _run(ref, ours, args=(t(X), t(ADJ), t(MASK)),
             jargs=(jnp.asarray(X), jnp.asarray(ADJ), jnp.asarray(MASK)))


def test_dense_graph_conv():
    for aggr in ('add', 'mean'):
        ref = td.DenseGraphConv(F, C, aggr=aggr)
        ours = pd.DenseGraphConv(out_channels=C, aggr=aggr)
        _run(ref, ours, args=(t(X), t(ADJ), t(MASK)),
             jargs=(jnp.asarray(X), jnp.asarray(ADJ), jnp.asarray(MASK)))


def test_dense_gin():
    tnn = torch.nn.Sequential(torch.nn.Linear(F, C), torch.nn.ReLU(),
                              torch.nn.Linear(C, C))

    class _JNN(fnn.Module):
        @fnn.compact
        def __call__(self, h):
            return fnn.Dense(C, name='lin1')(
                fnn.relu(fnn.Dense(C, name='lin0')(h)))

    ref = td.DenseGINConv(tnn, train_eps=True)
    ours = pd.DenseGINConv(nn=_JNN(), train_eps=True)
    ov = {
        'nn.lin0.kernel': lambda sd: sd['nn.0.weight'].T,
        'nn.lin0.bias': lambda sd: sd['nn.0.bias'],
        'nn.lin1.kernel': lambda sd: sd['nn.2.weight'].T,
        'nn.lin1.bias': lambda sd: sd['nn.2.bias'],
        'eps': lambda sd: sd['eps'].reshape(()),
    }
    _run(ref, ours, overrides=ov, args=(t(X), t(ADJ), t(MASK)),
         jargs=(jnp.asarray(X), jnp.asarray(ADJ), jnp.asarray(MASK)))


@pytest.mark.parametrize('concat', [True, False])
def test_dense_gat(concat):
    ref = td.DenseGATConv(F, C, heads=2, concat=concat)
    ours = pd.DenseGATConv(out_channels=C, heads=2, concat=concat)
    _run(ref, ours, args=(t(X), t(ADJ), t(MASK)),
         jargs=(jnp.asarray(X), jnp.asarray(ADJ), jnp.asarray(MASK)))


def test_hetero_linear():
    from torch_geometric.nn.dense import HeteroLinear as THL
    types = rng.integers(0, 3, N)
    x = rng.standard_normal((N, F)).astype(np.float32)
    ref = THL(F, C, num_types=3)
    with torch.no_grad():
        r = ref(t(x), t(types)).numpy()
    ours = pd.HeteroLinear(out_channels=C, num_types=3)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(types))
    params = transplant(ref, params, {
        'weight': lambda sd: sd['weight'],
        'bias': lambda sd: sd['bias'],
    })
    g = ours.apply(params, jnp.asarray(x), jnp.asarray(types))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-4)


def test_hetero_dict_linear():
    from torch_geometric.nn.dense import HeteroDictLinear as THDL
    xs = {'a': rng.standard_normal((5, F)).astype(np.float32),
          'b': rng.standard_normal((7, F)).astype(np.float32)}
    ref = THDL(F, C, types=['a', 'b'])
    with torch.no_grad():
        r = ref({k: t(v) for k, v in xs.items()})
    ours = pd.HeteroDictLinear(out_channels=C, types=('a', 'b'))
    jx = {k: jnp.asarray(v) for k, v in xs.items()}
    params = ours.init(jax.random.PRNGKey(0), jx)
    ov = {}
    for k in xs:
        ov[f'lin_{k}.kernel'] = \
            lambda sd, k=k: sd[f'lins.{k}.weight'].T
        ov[f'lin_{k}.bias'] = lambda sd, k=k: sd[f'lins.{k}.bias']
    params = transplant(ref, params, ov)
    g = ours.apply(params, jx)
    for k in xs:
        np.testing.assert_allclose(np.asarray(g[k]), r[k].numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_dmon_pooling():
    from torch_geometric.nn.dense import DMoNPooling as TDMoN
    K = 4
    ref = TDMoN(F, K)
    ref.eval()
    with torch.no_grad():
        rs, rx, radj, sp_l, o_l, c_l = ref(t(X), t(ADJ), t(MASK))
    ours = pd.DMoNPooling(k=K)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(ADJ), jnp.asarray(MASK))
    params = transplant(ref, params, {
        'mlp.kernel': lambda sd: sd['mlp.lins.0.weight'].T,
        'mlp.bias': lambda sd: sd['mlp.lins.0.bias'],
    })
    gs, gx, gadj, g_sp, g_o, g_c = ours.apply(
        params, jnp.asarray(X), jnp.asarray(ADJ), jnp.asarray(MASK))
    np.testing.assert_allclose(np.asarray(gs), rs.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), rx.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gadj), radj.numpy(), rtol=1e-3,
                               atol=1e-3)
    for a, b in ((g_sp, sp_l), (g_o, o_l), (g_c, c_l)):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-3,
                                   atol=1e-4)
