"""Parity wave 8 vs the reference PyG oracle: MODEL-level transplants —
JumpingKnowledge(lstm), LightGCN, PMLP, NeuralFingerprint, RECT_L,
LINKX, AttentiveFP, SignedGCN, GraphUNet, GAE.

Waivers: ViSNet (reference forward needs torch-cluster radius_graph);
SGFormer/Polynormer reference variants use torch-only attention blocks,
covered by self-consistency tests."""
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
from pytorch_geometric_tpu.nn.models import (JumpingKnowledge, LightGCN,
                                             PMLP, NeuralFingerprint,
                                             RECT_L, LINKX, AttentiveFP,
                                             SignedGCN, GraphUNet, GAE)
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(8)
N, E, F_IN = 16, 48, 8
X = rng.standard_normal((N, F_IN)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)
jX = jnp.asarray(X)
jCOO = jnp.asarray(COO.astype(np.int32))


def t(x):
    return torch.from_numpy(np.asarray(x))


def run(ours, ref, ref_out, *args, overrides=None, atol=1e-4,
        rtol=1e-4, **kwargs):
    params = ours.init(jax.random.PRNGKey(0), *args, **kwargs)
    params = transplant(ref, params, overrides)
    got = ours.apply(params, *args, **kwargs)
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=rtol,
                               atol=atol)
    return got


def _gru_overrides(flax_name, torch_name, h):
    """torch GRUCell (gates r|z|n stacked) -> flax GRUCell denses."""
    o = {}
    for gi, (i_d, h_d) in enumerate((('ir', 'hr'), ('iz', 'hz'),
                                     ('in', 'hn'))):
        sl = slice(gi * h, (gi + 1) * h)
        o[f'{flax_name}.{i_d}.kernel'] = (
            lambda sd, sl=sl: sd[f'{torch_name}.weight_ih'][sl].T)
        o[f'{flax_name}.{h_d}.kernel'] = (
            lambda sd, sl=sl: sd[f'{torch_name}.weight_hh'][sl].T)
        if i_d == 'in':
            o[f'{flax_name}.in.bias'] = (
                lambda sd, sl=sl: sd[f'{torch_name}.bias_ih'][sl])
            o[f'{flax_name}.hn.bias'] = (
                lambda sd, sl=sl: sd[f'{torch_name}.bias_hh'][sl])
        else:
            o[f'{flax_name}.{i_d}.bias'] = (
                lambda sd, sl=sl: (sd[f'{torch_name}.bias_ih'][sl]
                                   + sd[f'{torch_name}.bias_hh'][sl]))
    return o


def _lstm_overrides(flax_name, torch_suffix, h):
    """torch LSTM layer (gates i|f|g|o stacked) -> flax LSTMCell."""
    o = {}
    for gi, (i_d, h_d) in enumerate((('ii', 'hi'), ('if', 'hf'),
                                     ('ig', 'hg'), ('io', 'ho'))):
        sl = slice(gi * h, (gi + 1) * h)
        o[f'{flax_name}.{i_d}.kernel'] = (
            lambda sd, sl=sl:
            sd[f'lstm.weight_ih_l0{torch_suffix}'][sl].T)
        o[f'{flax_name}.{h_d}.kernel'] = (
            lambda sd, sl=sl:
            sd[f'lstm.weight_hh_l0{torch_suffix}'][sl].T)
        o[f'{flax_name}.{h_d}.bias'] = (
            lambda sd, sl=sl:
            sd[f'lstm.bias_ih_l0{torch_suffix}'][sl]
            + sd[f'lstm.bias_hh_l0{torch_suffix}'][sl])
    return o


def test_jumping_knowledge_lstm():
    L, C = 3, F_IN
    xs_t = [t(rng.standard_normal((N, C)).astype(np.float32))
            for _ in range(L)]
    ref = tg.nn.JumpingKnowledge('lstm', C, L).eval()
    with torch.no_grad():
        ref_out = ref(xs_t).numpy()
    hidden = (L * C) // 2
    overrides = {**_lstm_overrides('lstm_f', '', hidden),
                 **_lstm_overrides('lstm_b', '_reverse', hidden)}
    run(JumpingKnowledge(mode='lstm', channels=C, num_layers=L),
        ref, ref_out, [jnp.asarray(np.asarray(x)) for x in xs_t],
        overrides=overrides)


def test_lightgcn():
    ref = tm.LightGCN(N, F_IN, 2).eval()
    lbl = np.stack([rng.integers(0, N, 10), rng.integers(0, N, 10)])
    with torch.no_grad():
        ref_out = ref(t(COO), t(lbl)).numpy()
    run(LightGCN(num_nodes=N, embedding_dim=F_IN, num_layers=2),
        ref, ref_out, jCOO, jnp.asarray(lbl.astype(np.int32)),
        overrides={'embedding':
                   lambda sd: sd['embedding.weight']})


def test_pmlp_inference():
    ref = tm.PMLP(F_IN, 16, 6, num_layers=2).eval()   # eval => conv on
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    overrides = {}
    for i in range(2):
        overrides[f'lins_{i}.kernel'] = (
            lambda sd, i=i: sd[f'lins.{i}.weight'].T)
        overrides[f'bias_{i}'] = (
            lambda sd, i=i: sd[f'lins.{i}.bias'])
    run(PMLP(hidden_channels=16, out_channels=6, num_layers=2),
        ref, ref_out, jX, jCOO, use_conv=True, overrides=overrides)


def test_neural_fingerprint():
    D = 10
    ref = tm.NeuralFingerprint(F_IN, 16, 6, num_layers=2).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO),
                      torch.zeros(N, dtype=torch.long)).numpy()
    overrides = {}
    for li in range(2):
        overrides[f'lins_{li}.kernel'] = (
            lambda sd, li=li: sd[f'lins.{li}.weight'].T)
        for d in range(D + 1):
            overrides[f'convs_{li}.lin_l_{d}.kernel'] = (
                lambda sd, li=li, d=d:
                sd[f'convs.{li}.lins_l.{d}.weight'].T)
            overrides[f'convs_{li}.lin_l_{d}.bias'] = (
                lambda sd, li=li, d=d:
                sd[f'convs.{li}.lins_l.{d}.bias'])
            overrides[f'convs_{li}.lin_r_{d}.kernel'] = (
                lambda sd, li=li, d=d:
                sd[f'convs.{li}.lins_r.{d}.weight'].T)
    run(NeuralFingerprint(hidden_channels=16, out_channels=6,
                          num_layers=2),
        ref, ref_out, jX, jCOO, overrides=overrides)


def test_rect_l():
    ref = tm.RECT_L(F_IN, 6).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    run(RECT_L(in_channels=F_IN, hidden_channels=6), ref, ref_out,
        jX, jCOO,
        overrides={'conv.lin.kernel':
                   lambda sd: sd['conv.lin.weight'].T,
                   'conv.bias': lambda sd: sd['conv.bias']})


def test_linkx():
    ref = tm.LINKX(N, F_IN, 16, 6, num_layers=2, num_edge_layers=2,
                   num_node_layers=2).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    overrides = {
        'edge_embed': lambda sd: sd['edge_lin.weight'],
        'edge_bias': lambda sd: sd['edge_lin.bias'],
        'edge_norm.scale': lambda sd: sd['edge_norm.weight'],
        'edge_mlp.lin_0.kernel':
            lambda sd: sd['edge_mlp.lins.0.weight'].T,
        'edge_mlp.lin_0.bias': lambda sd: sd['edge_mlp.lins.0.bias'],
    }
    for mlp, n_lin in (('node_mlp', 2), ('final_mlp', 2)):
        for i in range(n_lin):
            overrides[f'{mlp}.lin_{i}.kernel'] = (
                lambda sd, mlp=mlp, i=i: sd[f'{mlp}.lins.{i}.weight'].T)
            overrides[f'{mlp}.lin_{i}.bias'] = (
                lambda sd, mlp=mlp, i=i: sd[f'{mlp}.lins.{i}.bias'])
        overrides[f'{mlp}.norm_0.scale'] = (
            lambda sd, mlp=mlp: sd[f'{mlp}.norms.0.module.weight'])
        overrides[f'{mlp}.norm_0.bias'] = (
            lambda sd, mlp=mlp: sd[f'{mlp}.norms.0.module.bias'])
    run(LINKX(num_nodes=N, hidden_channels=16, out_channels=6,
              num_layers=2, num_edge_layers=2, num_node_layers=2),
        ref, ref_out, jX, jCOO, overrides=overrides)


def test_attentive_fp():
    H = 16
    ea = rng.standard_normal((E, 4)).astype(np.float32)
    ref = tm.AttentiveFP(F_IN, H, 3, edge_dim=4, num_layers=2,
                         num_timesteps=2).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ea),
                      torch.zeros(N, dtype=torch.long)).numpy()
    overrides = {
        **_gru_overrides('gru', 'gru', H),
        **_gru_overrides('atom_grus_0', 'atom_grus.0', H),
        **_gru_overrides('mol_gru', 'mol_gru', H),
        'atom_convs_0.lin_src.kernel':
            lambda sd: sd['atom_convs.0.lin.weight'].T,
        'atom_convs_0.att_src': lambda sd: sd['atom_convs.0.att_src'],
        'atom_convs_0.att_dst': lambda sd: sd['atom_convs.0.att_dst'],
        'atom_convs_0.bias': lambda sd: sd['atom_convs.0.bias'],
        'mol_conv.lin_src.kernel':
            lambda sd: sd['mol_conv.lin.weight'].T,
        'mol_conv.lin_dst.kernel':
            lambda sd: sd['mol_conv.lin.weight'].T,
        'mol_conv.att_src': lambda sd: sd['mol_conv.att_src'],
        'mol_conv.att_dst': lambda sd: sd['mol_conv.att_dst'],
        'mol_conv.bias': lambda sd: sd['mol_conv.bias'],
    }
    run(AttentiveFP(in_channels=F_IN, hidden_channels=H,
                    out_channels=3, edge_dim=4, num_layers=2,
                    num_timesteps=2),
        ref, ref_out, jX, jCOO, jnp.asarray(ea),
        overrides=overrides)


def test_signed_gcn():
    pos = COO[:, :E // 2]
    neg = COO[:, E // 2:]
    ref = tm.SignedGCN(F_IN, 8, num_layers=2).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(pos), t(neg)).numpy()
    # ours: SignedConv lin_pos = [prop | x] concat kernel = [l | r]
    def cat_kernel(lk, rk):
        return lambda sd: np.concatenate([sd[lk].T, sd[rk].T], 0)
    overrides = {
        'conv0.lin_pos.kernel':
            cat_kernel('conv1.lin_pos_l.weight',
                       'conv1.lin_pos_r.weight'),
        'conv0.lin_pos.bias': lambda sd: sd['conv1.lin_pos_r.bias'],
        'conv0.lin_neg.kernel':
            cat_kernel('conv1.lin_neg_l.weight',
                       'conv1.lin_neg_r.weight'),
        'conv0.lin_neg.bias': lambda sd: sd['conv1.lin_neg_r.bias'],
    }
    # deep layer: ours concatenates [pos_prop, neg_prop, x]; reference
    # lin_pos_l spans the two propagated halves, lin_pos_r the root
    def deep_kernel(lk, rk):
        return lambda sd: np.concatenate([sd[lk].T, sd[rk].T], 0)
    overrides['conv_1.lin_pos.kernel'] = deep_kernel(
        'convs.0.lin_pos_l.weight', 'convs.0.lin_pos_r.weight')
    overrides['conv_1.lin_pos.bias'] = (
        lambda sd: sd['convs.0.lin_pos_r.bias'])
    overrides['conv_1.lin_neg.kernel'] = deep_kernel(
        'convs.0.lin_neg_l.weight', 'convs.0.lin_neg_r.weight')
    overrides['conv_1.lin_neg.bias'] = (
        lambda sd: sd['convs.0.lin_neg_r.bias'])
    run(SignedGCN(in_channels=F_IN, hidden_channels=4, num_layers=2),
        ref, ref_out, jX, jnp.asarray(pos.astype(np.int32)),
        jnp.asarray(neg.astype(np.int32)), overrides=overrides)


def test_graph_unet():
    ref = tm.GraphUNet(F_IN, 6, 5, depth=2).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    overrides = {}
    for i in range(3):
        overrides[f'down_convs_{i}.kernel'] = (
            lambda sd, i=i: sd[f'down_convs.{i}.lin.weight'].T)
        overrides[f'down_convs_{i}_bias'] = (
            lambda sd, i=i: sd[f'down_convs.{i}.bias'])
    for i in range(2):
        overrides[f'up_convs_{i}.kernel'] = (
            lambda sd, i=i: sd[f'up_convs.{i}.lin.weight'].T)
        overrides[f'up_convs_{i}_bias'] = (
            lambda sd, i=i: sd[f'up_convs.{i}.bias'])
        overrides[f'pools_{i}_weight'] = (
            lambda sd, i=i: sd[f'pools.{i}.select.weight'])
    run(GraphUNet(hidden_channels=6, out_channels=5, depth=2,
                  pool_ratio=0.5),
        ref, ref_out, jX, jCOO, overrides=overrides)


def test_gae():
    ref = tm.GAE(tg.nn.GCNConv(F_IN, 6)).eval()
    with torch.no_grad():
        z_ref = ref.encode(t(X), t(COO))
        dec_ref = ref.decode(z_ref, t(COO)).numpy()
    ours = GAE(encoder=pgnn.GCNConv(out_channels=6))
    params = ours.init(jax.random.PRNGKey(0), jX, jCOO)
    params = transplant(ref, params, {
        'encoder.lin.kernel': lambda sd: sd['encoder.lin.weight'].T,
        'encoder.bias': lambda sd: sd['encoder.bias'],
    })
    z = ours.apply(params, jX, jCOO)
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-4,
                               atol=1e-4)
    dec = GAE.decode(z, jCOO)
    np.testing.assert_allclose(np.asarray(dec), dec_ref, rtol=1e-4,
                               atol=1e-4)
