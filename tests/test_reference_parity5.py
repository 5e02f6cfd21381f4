"""Parity wave 5 vs the reference PyG oracle: the graph_conv /
spectral / gen_conv families (18 convs). Weights are transplanted from
the torch reference via ``testing.oracle.transplant`` and outputs
asserted allclose."""
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

rng = np.random.default_rng(5)
N, E, F_IN, F_OUT = 18, 52, 8, 12
X = rng.standard_normal((N, F_IN)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)
W = rng.random(E).astype(np.float32)
jX = jnp.asarray(X)
jCOO = jnp.asarray(COO.astype(np.int32))


def t(x):
    return torch.from_numpy(np.asarray(x))


def check(ours, ref_out, *args, overrides=None, atol=1e-4, rtol=1e-4,
          **kwargs):
    params = ours.init(jax.random.PRNGKey(0), *args, **kwargs)
    ref_mod = check._ref
    params = transplant(ref_mod, params, overrides)
    got = np.asarray(ours.apply(params, *args, **kwargs))
    np.testing.assert_allclose(got, ref_out, rtol=rtol, atol=atol)
    return got


def run_ref(ref, *args, **kwargs):
    ref = ref.eval()
    check._ref = ref
    with torch.no_grad():
        out = ref(*args, **kwargs)
    return out.numpy()


def test_le_conv():
    ref_out = run_ref(tg.nn.LEConv(F_IN, F_OUT), t(X), t(COO), t(W))
    check(pgnn.LEConv(out_channels=F_OUT), ref_out, jX, jCOO,
          edge_weight=jnp.asarray(W))


def test_cluster_gcn_conv():
    ref_out = run_ref(tg.nn.ClusterGCNConv(F_IN, F_OUT, diag_lambda=0.3),
                      t(X), t(COO))
    check(pgnn.ClusterGCNConv(out_channels=F_OUT, diag_lambda=0.3),
          ref_out, jX, jCOO)


def test_res_gated_graph_conv():
    ref_out = run_ref(tg.nn.ResGatedGraphConv(F_IN, F_OUT), t(X), t(COO))
    check(pgnn.ResGatedGraphConv(out_channels=F_OUT), ref_out, jX, jCOO)


def test_gated_graph_conv():
    H = 12
    ref_out = run_ref(tg.nn.GatedGraphConv(H, num_layers=2),
                      t(X), t(COO))

    def gru(gate, part, bias_sum=False):
        sl = {'r': slice(0, H), 'z': slice(H, 2 * H),
              'n': slice(2 * H, 3 * H)}[gate]

        def f(sd):
            if part == 'kernel_i':
                return sd['rnn.weight_ih'][sl].T
            if part == 'kernel_h':
                return sd['rnn.weight_hh'][sl].T
            if part == 'bias_i':
                b = sd['rnn.bias_ih'][sl]
                return b + sd['rnn.bias_hh'][sl] if bias_sum else b
            return sd['rnn.bias_hh'][sl]
        return f

    overrides = {
        'rnn.ir.kernel': gru('r', 'kernel_i'),
        'rnn.iz.kernel': gru('z', 'kernel_i'),
        'rnn.in.kernel': gru('n', 'kernel_i'),
        'rnn.hr.kernel': gru('r', 'kernel_h'),
        'rnn.hz.kernel': gru('z', 'kernel_h'),
        'rnn.hn.kernel': gru('n', 'kernel_h'),
        'rnn.ir.bias': gru('r', 'bias_i', bias_sum=True),
        'rnn.iz.bias': gru('z', 'bias_i', bias_sum=True),
        'rnn.in.bias': gru('n', 'bias_i'),
        'rnn.hn.bias': gru('n', 'bias_h'),
    }
    check(pgnn.GatedGraphConv(out_channels=H, num_layers=2), ref_out,
          jX, jCOO, overrides=overrides)


def test_fa_conv():
    ref_out = run_ref(tg.nn.FAConv(F_IN, eps=0.2), t(X), t(X), t(COO))
    check(pgnn.FAConv(eps=0.2), ref_out, jX, jCOO, x_0=jX)


def test_agnn_conv():
    ref_out = run_ref(tg.nn.AGNNConv(), t(X), t(COO))
    check(pgnn.AGNNConv(), ref_out, jX, jCOO)


def test_wl_conv_continuous():
    ref_out = run_ref(tg.nn.WLConvContinuous(), t(X), t(COO), t(W))
    check(pgnn.WLConvContinuous(), ref_out, jX, jCOO,
          edge_weight=jnp.asarray(W))


def test_lg_conv():
    ref_out = run_ref(tg.nn.LGConv(), t(X), t(COO))
    check(pgnn.LGConv(), ref_out, jX, jCOO)


def test_mf_conv():
    D = 6
    ref_out = run_ref(tg.nn.MFConv(F_IN, F_OUT, max_degree=D),
                      t(X), t(COO))
    overrides = {}
    for d in range(D + 1):
        overrides[f'lin_l_{d}.kernel'] = \
            (lambda d: lambda sd: sd[f'lins_l.{d}.weight'].T)(d)
        overrides[f'lin_l_{d}.bias'] = \
            (lambda d: lambda sd: sd[f'lins_l.{d}.bias'])(d)
        overrides[f'lin_r_{d}.kernel'] = \
            (lambda d: lambda sd: sd[f'lins_r.{d}.weight'].T)(d)
    check(pgnn.MFConv(out_channels=F_OUT, max_degree=D), ref_out,
          jX, jCOO, overrides=overrides)


def test_arma_conv():
    K, T = 2, 3
    ref_out = run_ref(
        tg.nn.ARMAConv(F_IN, F_OUT, num_stacks=K, num_layers=T),
        t(X), t(COO), t(W))
    overrides = {}
    for k in range(K):
        for tt in range(T):
            if tt == 0:
                overrides[f'stack_{k}_w_0.kernel'] = \
                    (lambda k: lambda sd: sd['init_weight'][k])(k)
            else:
                overrides[f'stack_{k}_w_{tt}.kernel'] = \
                    (lambda k, tt: lambda sd: sd['weight'][tt - 1, k])(k, tt)
            overrides[f'stack_{k}_v_{tt}.kernel'] = \
                (lambda k, tt: lambda sd: sd['root_weight'][tt, k])(k, tt)
            overrides[f'stack_{k}_v_{tt}.bias'] = \
                (lambda k, tt: lambda sd: sd['bias'][tt, k, 0])(k, tt)
    check(pgnn.ARMAConv(out_channels=F_OUT, num_stacks=K, num_layers=T),
          ref_out, jX, jCOO, edge_weight=jnp.asarray(W),
          overrides=overrides)


def test_ssg_conv():
    ref_out = run_ref(tg.nn.SSGConv(F_IN, F_OUT, alpha=0.3, K=2),
                      t(X), t(COO))
    check(pgnn.SSGConv(out_channels=F_OUT, alpha=0.3, K=2), ref_out,
          jX, jCOO)


def test_mixhop_conv():
    powers = [0, 1, 2]
    ref_out = run_ref(tg.nn.MixHopConv(F_IN, F_OUT, powers=powers),
                      t(X), t(COO))
    overrides = {}
    for i, p in enumerate(powers):
        overrides[f'lin_{p}.kernel'] = \
            (lambda i: lambda sd: sd[f'lins.{i}.weight'].T)(i)
        overrides[f'lin_{p}.bias'] = \
            (lambda i: lambda sd: sd[f'lins.{i}.bias'])(i)
    check(pgnn.MixHopConv(out_channels=F_OUT, powers=tuple(powers)),
          ref_out, jX, jCOO, overrides=overrides)


def test_film_conv():
    R = 3
    etype = rng.integers(0, R, E)
    ref_out = run_ref(tg.nn.FiLMConv(F_IN, F_OUT, num_relations=R),
                      t(X), t(COO), t(etype))
    overrides = {}
    for r in range(R):
        overrides[f'lin_{r}.kernel'] = \
            (lambda r: lambda sd: sd[f'lins.{r}.weight'].T)(r)
        overrides[f'film_{r}.kernel'] = \
            (lambda r: lambda sd: sd[f'films.{r}.weight'].T)(r)
        overrides[f'film_{r}.bias'] = \
            (lambda r: lambda sd: sd[f'films.{r}.bias'])(r)
    check(pgnn.FiLMConv(out_channels=F_OUT, num_relations=R), ref_out,
          jX, jCOO, edge_type=jnp.asarray(etype.astype(np.int32)),
          overrides=overrides)


def test_pdn_conv():
    ED, H = 5, 7
    ea = rng.standard_normal((E, ED)).astype(np.float32)
    ref_out = run_ref(
        tg.nn.PDNConv(F_IN, F_OUT, edge_dim=ED, hidden_channels=H),
        t(X), t(COO), t(ea))
    overrides = {
        'mlp_0.kernel': lambda sd: sd['mlp.0.weight'].T,
        'mlp_0.bias': lambda sd: sd['mlp.0.bias'],
        'mlp_1.kernel': lambda sd: sd['mlp.2.weight'].T,
        'mlp_1.bias': lambda sd: sd['mlp.2.bias'],
    }
    check(pgnn.PDNConv(out_channels=F_OUT, hidden_channels=H), ref_out,
          jX, jCOO, edge_attr=jnp.asarray(ea), overrides=overrides)


def test_gen_conv():
    ref = tg.nn.GENConv(F_IN, F_OUT, aggr='softmax', num_layers=2,
                        norm='layer')
    ref_out = run_ref(ref, t(X), t(COO))
    overrides = {
        'mlp.lin_0.kernel': lambda sd: sd['mlp.0.weight'].T,
        'mlp.lin_0.bias': lambda sd: sd['mlp.0.bias'],
        'mlp.lin_1.kernel': lambda sd: sd['mlp.4.weight'].T,
        'mlp.lin_1.bias': lambda sd: sd['mlp.4.bias'],
        'mlp.norm_0.scale': lambda sd: sd['mlp.1.weight'],
        'mlp.norm_0.bias': lambda sd: sd['mlp.1.bias'],
    }
    check(pgnn.GENConv(out_channels=F_OUT, aggr_mode='softmax',
                       num_layers=2, norm='layer_norm'), ref_out,
          jX, jCOO, overrides=overrides)


def test_general_conv():
    ref_out = run_ref(
        tg.nn.GeneralConv(F_IN, F_OUT, skip_linear=True), t(X), t(COO))
    check(pgnn.GeneralConv(out_channels=F_OUT, skip_linear=True),
          ref_out, jX, jCOO,
          overrides={'lin_self.kernel': lambda sd: sd['lin_self.weight'].T,
                     'lin_self.bias': lambda sd: sd['lin_self.bias']})


def test_general_conv_undirected_attention():
    ref_out = run_ref(
        tg.nn.GeneralConv(F_IN, F_OUT, skip_linear=True,
                          directed_msg=False, attention=True),
        t(X), t(COO))
    check(pgnn.GeneralConv(out_channels=F_OUT, skip_linear=True,
                           directed_msg=False, attention=True),
          ref_out, jX, jCOO,
          overrides={'att': lambda sd: sd['att_msg'][0]})


def test_eg_conv():
    ref_out = run_ref(
        tg.nn.EGConv(F_IN, F_OUT, aggregators=['symnorm', 'mean', 'max'],
                     num_heads=4, num_bases=3), t(X), t(COO))
    check(pgnn.EGConv(out_channels=F_OUT,
                      aggregators=('symnorm', 'mean', 'max'),
                      num_heads=4, num_bases=3), ref_out, jX, jCOO,
          overrides={
              'lin_bases.kernel': lambda sd: sd['bases_lin.weight'].T,
              'lin_comb.kernel': lambda sd: sd['comb_lin.weight'].T,
              'lin_comb.bias': lambda sd: sd['comb_lin.bias'],
          })


def test_pna_conv():
    deg_hist = torch.bincount(t(COO[1]), minlength=1)
    deg = torch.bincount(deg_hist)  # histogram of in-degrees
    ref = tg.nn.PNAConv(F_IN, F_OUT,
                        aggregators=['mean', 'min', 'max', 'std'],
                        scalers=['identity', 'amplification',
                                 'attenuation'],
                        deg=deg, towers=1)
    ref_out = run_ref(ref, t(X), t(COO))
    scaler_mod = ref.aggr_module
    overrides = {
        'pre_0.lin_0.kernel': lambda sd: sd['pre_nns.0.0.weight'].T,
        'pre_0.lin_0.bias': lambda sd: sd['pre_nns.0.0.bias'],
        'post_0.lin_0.kernel': lambda sd: sd['post_nns.0.0.weight'].T,
        'post_0.lin_0.bias': lambda sd: sd['post_nns.0.0.bias'],
        'lin_out.kernel': lambda sd: sd['lin.weight'].T,
        'lin_out.bias': lambda sd: sd['lin.bias'],
    }
    check(pgnn.PNAConv(out_channels=F_OUT,
                       avg_deg_log=float(scaler_mod.avg_deg_log),
                       avg_deg_lin=float(scaler_mod.avg_deg_lin)),
          ref_out, jX, jCOO, overrides=overrides, atol=2e-4)
