"""SGFormer / Polynormer full-model oracle parity vs the reference.

Both rebuilt reference-exact this round (eval semantics: dropout off,
fresh BatchNorm running stats). heads=1 everywhere — the reference
Polynormer itself shape-errors for heads>1 (its ``h_lins`` take
``hidden`` in but receive ``heads*hidden`` activations).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

rng = np.random.default_rng(23)
N, F_IN, H, C = 20, 8, 12, 4
X = rng.standard_normal((N, F_IN)).astype(np.float32)
COO = np.stack([rng.integers(0, N, 60), rng.integers(0, N, 60)]).astype(
    np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


def _lin(sd, key):
    return {'kernel': jnp.asarray(sd[key + '.weight'].T),
            'bias': jnp.asarray(sd[key + '.bias'])}


def _ln(sd, key):
    return {'scale': jnp.asarray(sd[key + '.weight']),
            'bias': jnp.asarray(sd[key + '.bias'])}


def _gcn(sd, key):
    return {'lin': {'kernel': jnp.asarray(sd[key + '.lin.weight'].T)},
            'bias': jnp.asarray(sd[key + '.bias'])}


def _bn(sd, key):
    params = {'bn': {'scale': jnp.asarray(sd[key + '.weight']),
                     'bias': jnp.asarray(sd[key + '.bias'])}}
    stats = {'bn': {'mean': jnp.asarray(sd[key + '.running_mean']),
                    'var': jnp.asarray(sd[key + '.running_var'])}}
    return params, stats


def _qkv(sd, key, names=('q', 'k', 'v')):
    return {n: {'kernel': jnp.asarray(sd[f'{key}.{n}.weight'].T)}
            for n in names}


def test_sgformer_oracle():
    from torch_geometric.nn.models import SGFormer as RefSG
    from pytorch_geometric_tpu.nn.models import SGFormer

    ref = RefSG(F_IN, H, C, trans_num_layers=2, trans_num_heads=1,
                gnn_num_layers=3, graph_weight=0.4)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    with torch.no_grad():
        r = ref(t(X), t(COO), torch.zeros(N, dtype=torch.long)).numpy()

    ours = SGFormer(hidden_channels=H, out_channels=C,
                    trans_num_layers=2, trans_num_heads=1,
                    gnn_num_layers=3, graph_weight=0.4)
    params = {'tc_fc0': _lin(sd, 'trans_conv.fcs.0'),
              'tc_ln0': _ln(sd, 'trans_conv.bns.0'),
              'gc_fc0': _lin(sd, 'graph_conv.fcs.0'),
              'fc': _lin(sd, 'fc')}
    stats = {}
    for i in range(2):
        params[f'tc_attn_{i}'] = _qkv(sd, f'trans_conv.attns.{i}')
        params[f'tc_ln_{i + 1}'] = _ln(sd, f'trans_conv.bns.{i + 1}')
    p0, s0 = _bn(sd, 'graph_conv.bns.0')
    params['gc_bn0'], stats['gc_bn0'] = p0, s0
    for i in range(3):
        params[f'gc_conv_{i}'] = _gcn(sd, f'graph_conv.convs.{i}')
        p, s = _bn(sd, f'graph_conv.bns.{i + 1}')
        params[f'gc_bn_{i + 1}'], stats[f'gc_bn_{i + 1}'] = p, s
    variables = {'params': params, 'batch_stats': stats}
    out = ours.apply(variables, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), r, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('use_global', [False, True])
def test_polynormer_oracle(use_global):
    from torch_geometric.nn.models import Polynormer as RefPoly
    from pytorch_geometric_tpu.nn.models import Polynormer

    ref = RefPoly(F_IN, H, C, local_layers=3, global_layers=2, heads=1,
                  beta=0.9, qk_shared=False, in_dropout=0.0)
    ref._global = use_global
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    with torch.no_grad():
        r = ref(t(X), t(COO), torch.zeros(N, dtype=torch.long)).numpy()

    ours = Polynormer(hidden_channels=H, out_channels=C, local_layers=3,
                      global_layers=2, heads=1, beta=0.9,
                      qk_shared=False, use_global=use_global)
    params = {'pred_local': _lin(sd, 'pred_local'),
              'pred_global': _lin(sd, 'pred_global'),
              'ln': _ln(sd, 'ln')}
    stats = {}
    for i in range(3):
        params[f'h_lin_{i}'] = _lin(sd, f'h_lins.{i}')
        params[f'local_conv_{i}'] = _gcn(sd, f'local_convs.{i}')
        params[f'lin_{i}'] = _lin(sd, f'lins.{i}')
        params[f'ln_{i}'] = _ln(sd, f'lns.{i}')
        p, s = _bn(sd, f'post_bns.{i}')
        params[f'post_bn_{i}'], stats[f'post_bn_{i}'] = p, s
    for j in range(2):
        key = f'global_attn.{j}'
        params[f'global_attn_{j}'] = {
            **_qkv(sd, key),
            'h_lins': _lin(sd, key + '.h_lins'),
            'lns': _ln(sd, key + '.lns'),
            'lin_out': _lin(sd, key + '.lin_out'),
        }
    variables = {'params': params, 'batch_stats': stats}
    out = ours.apply(variables, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), r, rtol=1e-4, atol=1e-4)
