"""Parity wave 7 vs the reference PyG oracle: the attention/hetero
family — SuperGAT (MX+SD), RGAT (across/within, additive/
multiplicative, bases, f-additive), HEAT, GPS, HGT, HAN, HeteroConv,
FastRGCN. Weights transplanted from the torch reference; outputs
asserted allclose.

Oracle waivers (reference module cannot run in this environment):
- SplineConv: reference requires ``torch-spline-conv`` (absent);
  covered by tests/test_spline_degree.py invariants instead.
- XConv: reference requires ``torch-cluster`` (absent).
- PANConv: reference requires ``torch-sparse`` (absent); covered by
  tests/test_wave5.py against the dense MET construction.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn as pgnn
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(7)
N, E, F_IN = 20, 60, 8
X = rng.standard_normal((N, F_IN)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)
ETYPE = rng.integers(0, 3, E).astype(np.int64)
jX = jnp.asarray(X)
jCOO = jnp.asarray(COO.astype(np.int32))
jET = jnp.asarray(ETYPE.astype(np.int32))


def t(x):
    return torch.from_numpy(np.asarray(x))


def check(ours, ref, ref_out, *args, overrides=None, atol=1e-4,
          rtol=1e-4, **kwargs):
    params = ours.init(jax.random.PRNGKey(0), *args, **kwargs)
    params = transplant(ref, params, overrides)
    got = ours.apply(params, *args, **kwargs)
    np.testing.assert_allclose(np.asarray(got), ref_out, rtol=rtol,
                               atol=atol)
    return got


@pytest.mark.parametrize('att_type', ['MX', 'SD'])
def test_supergat(att_type):
    ref = tg.nn.SuperGATConv(F_IN, 6, heads=2,
                             attention_type=att_type).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    check(pgnn.SuperGATConv(out_channels=6, heads=2,
                            attention_type=att_type),
          ref, ref_out, jX, jCOO)


def test_supergat_no_concat():
    ref = tg.nn.SuperGATConv(F_IN, 6, heads=2, concat=False).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    check(pgnn.SuperGATConv(out_channels=6, heads=2, concat=False),
          ref, ref_out, jX, jCOO)


def test_rgat_default():
    ref = tg.nn.RGATConv(F_IN, 6, num_relations=3, heads=2).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ETYPE)).numpy()
    check(pgnn.RGATConv(out_channels=6, num_relations=3, heads=2),
          ref, ref_out, jX, jCOO, jET)


def test_rgat_within_relation():
    ref = tg.nn.RGATConv(F_IN, 6, num_relations=3, heads=2,
                         attention_mechanism='within-relation').eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ETYPE)).numpy()
    check(pgnn.RGATConv(out_channels=6, num_relations=3, heads=2,
                        attention_mechanism='within-relation'),
          ref, ref_out, jX, jCOO, jET)


def test_rgat_multiplicative():
    ref = tg.nn.RGATConv(
        F_IN, 6, num_relations=3, heads=2, dim=2,
        attention_mode='multiplicative-self-attention').eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ETYPE)).numpy()
    check(pgnn.RGATConv(out_channels=6, num_relations=3, heads=2,
                        dim=2,
                        attention_mode='multiplicative-self-attention'),
          ref, ref_out, jX, jCOO, jET)


def test_rgat_bases_fadditive():
    ref = tg.nn.RGATConv(F_IN, 6, num_relations=3, heads=2,
                         num_bases=2, mod='f-additive').eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ETYPE)).numpy()
    check(pgnn.RGATConv(out_channels=6, num_relations=3, heads=2,
                        num_bases=2, mod='f-additive'),
          ref, ref_out, jX, jCOO, jET)


def test_rgat_edge_attr():
    ea = rng.standard_normal((E, 5)).astype(np.float32)
    ref = tg.nn.RGATConv(F_IN, 6, num_relations=3, heads=2,
                         edge_dim=5).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ETYPE), t(ea)).numpy()
    check(pgnn.RGATConv(out_channels=6, num_relations=3, heads=2,
                        edge_dim=5),
          ref, ref_out, jX, jCOO, jET, jnp.asarray(ea))


def test_heat():
    ntype = rng.integers(0, 2, N).astype(np.int64)
    ea = rng.standard_normal((E, 2)).astype(np.float32)
    ref = tg.nn.HEATConv(F_IN, 6, num_node_types=2, num_edge_types=3,
                         edge_type_emb_dim=4, edge_dim=2,
                         edge_attr_emb_dim=5, heads=2).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ntype), t(ETYPE), t(ea)).numpy()
    overrides = {
        'edge_type_emb.embedding':
            lambda sd: sd['edge_type_emb.weight'],
        'lin_v.kernel': lambda sd: sd['lin.weight'].T,
        'lin_v.bias': lambda sd: sd['lin.bias'],
    }
    check(pgnn.HEATConv(out_channels=6, num_node_types=2,
                        num_edge_types=3, edge_type_emb_dim=4,
                        edge_dim=2, edge_attr_emb_dim=5, heads=2),
          ref, ref_out, jX, jCOO,
          jnp.asarray(ntype.astype(np.int32)), jET, jnp.asarray(ea),
          overrides=overrides)


def test_fast_rgcn():
    ref = tg.nn.FastRGCNConv(F_IN, 6, num_relations=3).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ETYPE)).numpy()
    ours = pgnn.FastRGCNConv(out_channels=6, num_relations=3)
    params = ours.init(jax.random.PRNGKey(0), jX, jCOO, jET)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    overrides = {
        'weight': lambda s: s['weight'],
        'root.kernel': lambda s: s['root'],
        'bias': lambda s: s['bias'],
    }
    got = check(ours, ref, ref_out, jX, jCOO, jET, overrides=overrides)
    assert np.asarray(got).shape == (N, 6)


def _mha_overrides(prefix='attn', C=8, H=2):
    D = C // H

    def q_k(sd):
        return sd[f'{prefix}.in_proj_weight'][:C].T.reshape(C, H, D)

    def k_k(sd):
        return sd[f'{prefix}.in_proj_weight'][C:2 * C].T.reshape(C, H, D)

    def v_k(sd):
        return sd[f'{prefix}.in_proj_weight'][2 * C:].T.reshape(C, H, D)

    return {
        f'{prefix}.query.kernel': q_k,
        f'{prefix}.key.kernel': k_k,
        f'{prefix}.value.kernel': v_k,
        f'{prefix}.query.bias':
            lambda sd: sd[f'{prefix}.in_proj_bias'][:C].reshape(H, D),
        f'{prefix}.key.bias':
            lambda sd: sd[f'{prefix}.in_proj_bias'][C:2 * C].reshape(H, D),
        f'{prefix}.value.bias':
            lambda sd: sd[f'{prefix}.in_proj_bias'][2 * C:].reshape(H, D),
        f'{prefix}.out.kernel':
            lambda sd: sd[f'{prefix}.out_proj.weight'].T.reshape(H, D, C),
        f'{prefix}.out.bias': lambda sd: sd[f'{prefix}.out_proj.bias'],
    }


def test_gps():
    C, H = F_IN, 2
    mlp = torch.nn.Sequential(torch.nn.Linear(C, C))
    ref = tg.nn.GPSConv(C, tg.nn.GINConv(mlp), heads=H).eval()
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    import flax.linen as fnn
    ours = pgnn.GPSConv(channels=C,
                        conv=pgnn.GINConv(mlp=fnn.Dense(C)), heads=H)
    overrides = dict(_mha_overrides('attn', C, H))
    overrides.update({
        'conv.mlp.kernel': lambda sd: sd['conv.nn.0.weight'].T,
        'conv.mlp.bias': lambda sd: sd['conv.nn.0.bias'],
        'ff1.kernel': lambda sd: sd['mlp.0.weight'].T,
        'ff1.bias': lambda sd: sd['mlp.0.bias'],
        'ff2.kernel': lambda sd: sd['mlp.3.weight'].T,
        'ff2.bias': lambda sd: sd['mlp.3.bias'],
        'norm1.scale': lambda sd: sd['norm1.module.weight'],
        'norm1.bias': lambda sd: sd['norm1.module.bias'],
        'norm2.scale': lambda sd: sd['norm2.module.weight'],
        'norm2.bias': lambda sd: sd['norm2.module.bias'],
        'norm3.scale': lambda sd: sd['norm3.module.weight'],
        'norm3.bias': lambda sd: sd['norm3.module.bias'],
    })
    check(ours, ref, ref_out, jX, jCOO, overrides=overrides)


# -- hetero ---------------------------------------------------------------

META = (('a', 'b'), (('a', 'to', 'b'), ('b', 'to', 'a')))
XB = rng.standard_normal((N, F_IN)).astype(np.float32)
COO2 = np.stack([rng.integers(0, N, E),
                 rng.integers(0, N, E)]).astype(np.int64)


def _xd():
    return ({'a': t(X), 'b': t(XB)},
            {'a': jX, 'b': jnp.asarray(XB)})


def _eid():
    return ({('a', 'to', 'b'): t(COO), ('b', 'to', 'a'): t(COO2)},
            {('a', 'to', 'b'): jCOO,
             ('b', 'to', 'a'): jnp.asarray(COO2.astype(np.int32))})


def test_hgt():
    C, H = 8, 2
    D = C // H
    tx, jx = _xd()
    te, je = _eid()
    meta = ([*META[0]], [tuple(e) for e in META[1]])
    ref = tg.nn.HGTConv(F_IN, C, meta, heads=H).eval()
    with torch.no_grad():
        ref_out = ref(tx, te)
    ours = pgnn.HGTConv(out_channels=C, metadata=META, heads=H)
    overrides = {}
    R = len(META[1])
    for ti in META[0]:
        overrides[f'k_{ti}.kernel'] = (
            lambda sd, ti=ti: sd[f'kqv_lin.lins.{ti}.weight'][:C].T)
        overrides[f'k_{ti}.bias'] = (
            lambda sd, ti=ti: sd[f'kqv_lin.lins.{ti}.bias'][:C])
        overrides[f'q_{ti}.kernel'] = (
            lambda sd, ti=ti: sd[f'kqv_lin.lins.{ti}.weight'][C:2 * C].T)
        overrides[f'q_{ti}.bias'] = (
            lambda sd, ti=ti: sd[f'kqv_lin.lins.{ti}.bias'][C:2 * C])
        overrides[f'v_{ti}.kernel'] = (
            lambda sd, ti=ti: sd[f'kqv_lin.lins.{ti}.weight'][2 * C:].T)
        overrides[f'v_{ti}.bias'] = (
            lambda sd, ti=ti: sd[f'kqv_lin.lins.{ti}.bias'][2 * C:])
        overrides[f'out_{ti}.kernel'] = (
            lambda sd, ti=ti: sd[f'out_lin.lins.{ti}.weight'].T)
        overrides[f'out_{ti}.bias'] = (
            lambda sd, ti=ti: sd[f'out_lin.lins.{ti}.bias'])
        overrides[f'skip_{ti}'] = (
            lambda sd, ti=ti: sd[f'skip.{ti}'].reshape(()))
    for r, et in enumerate(META[1]):
        name = '__'.join(et)
        overrides[f'a_rel_{name}'] = (
            lambda sd, r=r: np.stack([sd['k_rel.weight'][h * R + r]
                                      for h in range(H)]))
        overrides[f'm_rel_{name}'] = (
            lambda sd, r=r: np.stack([sd['v_rel.weight'][h * R + r]
                                      for h in range(H)]))
        overrides[f'p_rel_{name}'] = (
            lambda sd, name=name: sd[f'p_rel.{name}'].ravel())
    params = ours.init(jax.random.PRNGKey(0), jx, je)
    params = transplant(ref, params, overrides)
    got = ours.apply(params, jx, je)
    for k in ref_out:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   ref_out[k].numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_han():
    C, H = 8, 2
    tx, jx = _xd()
    te, je = _eid()
    meta = ([*META[0]], [tuple(e) for e in META[1]])
    ref = tg.nn.HANConv(F_IN, C, meta, heads=H).eval()
    with torch.no_grad():
        ref_out = ref(tx, te)
    ours = pgnn.HANConv(out_channels=C, metadata=META, heads=H)
    overrides = {}
    for ti in META[0]:
        overrides[f'proj_{ti}.kernel'] = (
            lambda sd, ti=ti: sd[f'proj.{ti}.weight'].T)
        overrides[f'proj_{ti}.bias'] = (
            lambda sd, ti=ti: sd[f'proj.{ti}.bias'])
    for et in META[1]:
        name = '__'.join(et)
        overrides[f'att_src_{name}'] = (
            lambda sd, name=name: sd[f'lin_src.{name}'])
        overrides[f'att_dst_{name}'] = (
            lambda sd, name=name: sd[f'lin_dst.{name}'])
    params = ours.init(jax.random.PRNGKey(0), jx, je)
    params = transplant(ref, params, overrides)
    got = ours.apply(params, jx, je)
    for k in ref_out:
        if ref_out[k] is None:
            assert got[k] is None
            continue
        np.testing.assert_allclose(np.asarray(got[k]),
                                   ref_out[k].numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_hetero_conv():
    tx, jx = _xd()
    te, je = _eid()
    ref = tg.nn.HeteroConv({
        ('a', 'to', 'b'): tg.nn.SAGEConv(F_IN, 6),
        ('b', 'to', 'a'): tg.nn.SAGEConv(F_IN, 6),
    }, aggr='sum').eval()
    with torch.no_grad():
        ref_out = ref(tx, te)
    ours = pgnn.HeteroConv({
        ('a', 'to', 'b'): pgnn.SAGEConv(out_channels=6),
        ('b', 'to', 'a'): pgnn.SAGEConv(out_channels=6),
    }, aggr='sum')
    overrides = {}
    for et in META[1]:
        name = '__'.join(et)
        rkey = '<' + '___'.join(et) + '>'
        for lin in ('lin_l', 'lin_r'):
            overrides[f'conv_{name}.{lin}.kernel'] = (
                lambda sd, rkey=rkey, lin=lin:
                sd[f'convs.{rkey}.{lin}.weight'].T)
        overrides[f'conv_{name}.lin_l.bias'] = (
            lambda sd, rkey=rkey: sd[f'convs.{rkey}.lin_l.bias'])
    params = ours.init(jax.random.PRNGKey(0), jx, je)
    params = transplant(ref, params, overrides)
    got = ours.apply(params, jx, je)
    for k in ref_out:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   ref_out[k].numpy(),
                                   rtol=1e-4, atol=1e-4)
