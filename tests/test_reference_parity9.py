"""Parity wave 9 vs the reference PyG oracle: post-processing +
auxiliary models — LabelPropagation, CorrectAndSmooth, MaskLabel,
DeepGCNLayer, DeepGraphInfomax, RotatE, ComplEx, GroupAddRev."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.nn.models as tm

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn as pgnn
import pytorch_geometric_tpu.nn.kge as pkge
import pytorch_geometric_tpu.nn.models as pm
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(9)
N, E, C = 14, 40, 3
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)
jCOO = jnp.asarray(COO.astype(np.int32))
Y = rng.integers(0, C, N)
SOFT = rng.random((N, C)).astype(np.float32)
SOFT /= SOFT.sum(-1, keepdims=True)
MASK = rng.random(N) < 0.5


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_label_propagation():
    ref = tm.LabelPropagation(num_layers=4, alpha=0.85)
    ref_out = ref(t(Y), t(COO), mask=t(MASK)).numpy()
    ours = pm.LabelPropagation(num_layers=4, alpha=0.85)
    got = ours(jax.nn.one_hot(jnp.asarray(Y), C), jCOO,
               label_mask=jnp.asarray(MASK))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize('autoscale', [True, False])
def test_correct_and_smooth(autoscale):
    ref = tm.CorrectAndSmooth(num_correction_layers=3,
                              correction_alpha=0.7,
                              num_smoothing_layers=2,
                              smoothing_alpha=0.9,
                              autoscale=autoscale, scale=0.6)
    y_true = t(Y)[t(MASK)]
    r = ref.correct(t(SOFT), y_true, t(MASK), t(COO))
    r = ref.smooth(r, y_true, t(MASK), t(COO)).numpy()
    ours = pm.CorrectAndSmooth(num_correction_layers=3,
                               correction_alpha=0.7,
                               num_smoothing_layers=2,
                               smoothing_alpha=0.9,
                               autoscale=autoscale, scale=0.6)
    y1 = jax.nn.one_hot(jnp.asarray(Y), C)
    g = ours.correct(jnp.asarray(SOFT), y1, jnp.asarray(MASK), jCOO)
    g = ours.smooth(g, y1, jnp.asarray(MASK), jCOO)
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('method', ['add', 'concat'])
def test_mask_label(method):
    F = 6
    x = rng.standard_normal((N, F)).astype(np.float32)
    ref = tm.MaskLabel(num_classes=C, out_channels=F, method=method)
    ref_out = ref(t(x), t(Y), t(MASK)).detach().numpy()
    ours = pm.MaskLabel(num_classes=C, out_channels=F, method=method)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(Y), jnp.asarray(MASK))
    params = transplant(ref, params,
                        {'emb.embedding': lambda sd: sd['emb.weight']})
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(Y),
                     jnp.asarray(MASK))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-5,
                               atol=1e-5)


def test_deep_gcn_layer_res_plus():
    F = 8
    x = rng.standard_normal((N, F)).astype(np.float32)
    conv_ref = tg.nn.GENConv(F, F, aggr='softmax', num_layers=2,
                             norm='layer')
    ref = tm.DeepGCNLayer(conv=conv_ref, act=torch.nn.ReLU(),
                          block='res+').eval()
    ref_out = ref(t(x), t(COO)).detach().numpy()
    ours = pm.DeepGCNLayer(
        conv=pgnn.GENConv(out_channels=F, aggr_mode='softmax',
                          num_layers=2, norm='layer_norm'),
        block='res+')
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jCOO)
    overrides = {
        'conv.mlp.lin_0.kernel': lambda sd: sd['mlp.0.weight'].T,
        'conv.mlp.lin_0.bias': lambda sd: sd['mlp.0.bias'],
        'conv.mlp.lin_1.kernel': lambda sd: sd['mlp.4.weight'].T,
        'conv.mlp.lin_1.bias': lambda sd: sd['mlp.4.bias'],
        'conv.mlp.norm_0.scale': lambda sd: sd['mlp.1.weight'],
        'conv.mlp.norm_0.bias': lambda sd: sd['mlp.1.bias'],
    }
    params = transplant(conv_ref, params, overrides)
    got = ours.apply(params, jnp.asarray(x), jCOO)
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_deep_graph_infomax():
    F, H = 8, 10
    x = rng.standard_normal((N, F)).astype(np.float32)
    enc_ref = tg.nn.GCNConv(F, H)

    class RefEnc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = enc_ref

        def forward(self, x, ei):
            return self.conv(x, ei)

    def ref_corrupt(x, ei):
        return torch.flip(x, [0]), ei

    ref = tm.DeepGraphInfomax(
        hidden_channels=H, encoder=RefEnc(),
        summary=lambda z, *a: torch.sigmoid(z.mean(0)),
        corruption=ref_corrupt).eval()
    pos_r, neg_r, s_r = ref(t(x), t(COO))
    loss_r = float(ref.loss(pos_r, neg_r, s_r))

    def corrupt(x, ei):
        return x[::-1], ei

    ours = pm.DeepGraphInfomax(hidden_channels=H,
                               encoder=pgnn.GCNConv(out_channels=H),
                               corruption=corrupt)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jCOO)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = transplant(
        ref, params,
        {'weight': lambda s: s['weight'],
         'encoder.lin.kernel': lambda s: s['encoder.conv.lin.weight'].T,
         'encoder.bias': lambda s: s['encoder.conv.bias']})
    pos, neg, s, w = ours.apply(params, jnp.asarray(x), jCOO)
    np.testing.assert_allclose(np.asarray(pos),
                               pos_r.detach().numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(neg),
                               neg_r.detach().numpy(), rtol=1e-4,
                               atol=1e-4)
    loss = float(pm.DeepGraphInfomax.loss(pos, neg, s, w))
    assert abs(loss - loss_r) < 1e-4


@pytest.mark.parametrize('cls', ['RotatE', 'ComplEx'])
def test_kge_rotate_complex(cls):
    NN, NR, H = 12, 4, 6
    h = rng.integers(0, NN, 9)
    r = rng.integers(0, NR, 9)
    tl = rng.integers(0, NN, 9)
    ref = getattr(tg.nn.kge if hasattr(tg.nn, 'kge') else tg.nn,
                  cls)(NN, NR, H)
    ref_out = ref(t(h), t(r), t(tl)).detach().numpy()
    ours = getattr(pkge, cls)(num_nodes=NN, num_relations=NR,
                              hidden_channels=H)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(h),
                       jnp.asarray(r), jnp.asarray(tl))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    if cls == 'RotatE':
        node = np.concatenate([sd['node_emb.weight'],
                               sd['node_emb_im.weight']], -1)
        rel = sd['rel_emb.weight']
    else:
        node = np.concatenate([sd['node_emb.weight'],
                               sd['node_emb_im.weight']], -1)
        rel = np.concatenate([sd['rel_emb.weight'],
                              sd['rel_emb_im.weight']], -1)
    params = transplant(ref, params, {'node_emb': lambda s: node,
                                      'rel_emb': lambda s: rel})
    got = ours.apply(params, jnp.asarray(h), jnp.asarray(r),
                     jnp.asarray(tl))
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_group_add_rev():
    """Grouped reversible block vs the reference (disable=True runs the
    reference forward without the invertible autograd machinery)."""
    F = 8
    x = rng.standard_normal((N, 2 * F)).astype(np.float32)
    ref = tm.GroupAddRev(tg.nn.SAGEConv(F, F), num_groups=2,
                         disable=True).eval()
    ref_out = ref(t(x), t(COO)).detach().numpy()
    ours = pm.GroupAddRev(conv=pgnn.SAGEConv(out_channels=F),
                          num_groups=2)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jCOO)
    o = {}
    for g in range(2):
        o[f'conv_{g}.lin_l.kernel'] = (
            lambda s, g=g: s[f'convs.{g}.lin_l.weight'].T)
        o[f'conv_{g}.lin_l.bias'] = (
            lambda s, g=g: s[f'convs.{g}.lin_l.bias'])
        o[f'conv_{g}.lin_r.kernel'] = (
            lambda s, g=g: s[f'convs.{g}.lin_r.weight'].T)
    params = transplant(ref, params, o)
    got = ours.apply(params, jnp.asarray(x), jCOO)
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-4,
                               atol=1e-4)
