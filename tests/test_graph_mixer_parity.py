"""Parity wave 13 vs the reference PyG oracle: GraphMixer components —
NodeEncoder, get_latest_k_edge_attr, and LinkEncoder (TemporalEncoding +
MLP-Mixer over the k latest links)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
from torch_geometric.nn.models import graph_mixer as rgm

import jax
import jax.numpy as jnp

from pytorch_geometric_tpu.nn.models import graph_mixer as jgm
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(13)
N, E, F = 12, 50, 6
COO = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
TIME = rng.integers(0, 20, E).astype(np.int64)
SEED_T = rng.integers(5, 20, N).astype(np.int64)
ATTR = rng.standard_normal((E, F)).astype(np.float32)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_node_encoder():
    x = rng.standard_normal((N, F)).astype(np.float32)
    ref = rgm.NodeEncoder(time_window=8)
    r = ref(t(x), t(COO), t(TIME), t(SEED_T)).numpy()
    ours = jgm.NodeEncoder(time_window=8)
    g = ours(jnp.asarray(x), jnp.asarray(COO.astype(np.int32)),
             jnp.asarray(TIME.astype(np.float32)),
             jnp.asarray(SEED_T.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('k', [3, 7])
def test_get_latest_k_edge_attr(k):
    r = rgm.get_latest_k_edge_attr(k, t(COO), t(ATTR), t(TIME), N).numpy()
    g = jgm.get_latest_k_edge_attr(
        k, jnp.asarray(COO.astype(np.int32)), jnp.asarray(ATTR),
        jnp.asarray(TIME.astype(np.float32)), N)
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-6)


def _lin(ov, fpath, tname, bias=True):
    ov[f'{fpath}.kernel'] = lambda sd, k=tname: sd[f'{k}.weight'].T
    if bias:
        ov[f'{fpath}.bias'] = lambda sd, k=tname: sd[f'{k}.bias']


def _norm(ov, fpath, tname):
    ov[f'{fpath}.scale'] = lambda sd, k=tname: sd[f'{k}.weight']
    ov[f'{fpath}.bias'] = lambda sd, k=tname: sd[f'{k}.bias']


def test_link_encoder():
    K, H, C, T = 4, 8, 5, 10
    ref = rgm.LinkEncoder(k=K, in_channels=F, hidden_channels=H,
                          out_channels=C, time_channels=T)
    ref.eval()
    with torch.no_grad():
        r = ref(t(COO), t(ATTR), t(TIME.astype(np.float32)),
                t(SEED_T.astype(np.float32))).numpy()

    ours = jgm.LinkEncoder(k=K, in_channels=H, hidden_channels=H,
                           out_channels=C, time_channels=T)
    args = (jnp.asarray(COO.astype(np.int32)), jnp.asarray(ATTR),
            jnp.asarray(TIME.astype(np.float32)),
            jnp.asarray(SEED_T.astype(np.float32)))
    params = ours.init(jax.random.PRNGKey(0), *args)
    ov = {}
    _lin(ov, 'temporal_head', 'temporal_head')
    for name in ('token_lin1', 'token_lin2', 'channel_lin1',
                 'channel_lin2', 'head_lin'):
        _lin(ov, f'mlp_mixer.{name}', f'mlp_mixer.{name}')
    for name in ('token_norm', 'channel_norm', 'head_norm'):
        _norm(ov, f'mlp_mixer.{name}', f'mlp_mixer.{name}')
    params = transplant(ref, params, ov)
    g = ours.apply(params, *args)
    # atol 3e-5: XLA:CPU fusion order varies with what compiled earlier
    # in the process; observed 1.3e-5 max-abs drift when run after the
    # schnet+visnet parity files but not in isolation.
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=3e-5)


def test_gpse_node_encoder():
    """GPSENodeEncoder oracle (reference gpse.py:615): mlp and linear
    encoders, eval mode (fresh batch-norm running stats = identity)."""
    from torch_geometric.nn.models import GPSENodeEncoder as TEnc
    from pytorch_geometric_tpu.nn.models import GPSENodeEncoder
    x = rng.standard_normal((N, 6)).astype(np.float32)
    pe_in = rng.standard_normal((N, 4)).astype(np.float32)
    for model_type in ('mlp', 'linear'):
        ref = TEnc(dim_emb=16, dim_pe_in=4, dim_pe_out=8, dim_in=6,
                   expand_x=True, model_type=model_type, n_layers=3)
        ref.eval()
        with torch.no_grad():
            r = ref(t(x), t(pe_in)).numpy()
        ours = GPSENodeEncoder(dim_emb=16, dim_pe_in=4, dim_pe_out=8,
                               dim_in=6, expand_x=True,
                               model_type=model_type, n_layers=3)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                              jnp.asarray(pe_in))
        ov = {'raw_norm.scale': lambda sd: sd['raw_norm.weight'],
              'raw_norm.bias': lambda sd: sd['raw_norm.bias']}
        if model_type == 'linear':
            _lin(ov, 'pe_encoder', 'pe_encoder')
        else:
            for i in range(3):
                _lin(ov, f'pe_encoder_{2 * i}', f'pe_encoder.{2 * i}')
        _lin(ov, 'linear_x', 'linear_x')
        variables = transplant(ref, variables, ov)
        g = ours.apply(variables, jnp.asarray(x), jnp.asarray(pe_in))
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)
