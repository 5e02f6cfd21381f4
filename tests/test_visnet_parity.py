"""Parity wave 12 vs the reference PyG oracle: ViSNet — radial basis /
cutoff / spherical harmonics / VecLayerNorm components, and the full
ViSNet energy model (reference ``Distance`` stubbed with fixed edges so
torch-cluster isn't needed)."""
import math
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
from torch_geometric.nn.models import visnet as rv

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.models as pm
from pytorch_geometric_tpu.nn.models import visnet as jv
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(12)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_exp_normal_smearing():
    d = (rng.random(20) * 5).astype(np.float32)
    ref = rv.ExpNormalSmearing(cutoff=5.0, num_rbf=16)
    with torch.no_grad():
        r = ref(t(d)).numpy()
    g = jv.ExpNormalSmearing(cutoff=5.0, num_rbf=16).apply({}, jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-6)


def test_cosine_cutoff():
    d = (rng.random(20) * 7).astype(np.float32)
    ref = rv.CosineCutoff(cutoff=5.0)
    r = ref(t(d)).numpy()
    g = jv.cosine_cutoff(jnp.asarray(d), 5.0)
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize('lmax', [1, 2])
def test_sphere_harmonics(lmax):
    v = rng.standard_normal((15, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    ref = rv.Sphere(lmax=lmax)
    r = ref(t(v)).numpy()
    g = jv.sphere_harmonics(jnp.asarray(v), lmax)
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('L', [3, 8])
def test_vec_layer_norm(L):
    v = rng.standard_normal((10, L, 6)).astype(np.float32)
    ref = rv.VecLayerNorm(6, trainable=False, norm_type='max_min')
    with torch.no_grad():
        r = ref(t(v)).numpy()
    ours = jv.VecLayerNorm(6, norm_type='max_min')
    g = ours.apply({}, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


def _mol(n=6, cutoff=5.0):
    """A small molecule + the (loops-last) edge set the reference
    Distance module would produce inside the cutoff."""
    z = rng.integers(1, 10, n)
    pos = (rng.random((n, 3)) * 2.5).astype(np.float32)
    srcs, dsts = [], []
    for i in range(n):
        for j in range(n):
            if i != j and np.linalg.norm(pos[i] - pos[j]) < cutoff:
                srcs.append(i), dsts.append(j)
    for i in range(n):          # self loops (Distance add_self_loops=True)
        srcs.append(i), dsts.append(i)
    coo = np.stack([np.array(srcs), np.array(dsts)]).astype(np.int64)
    vec = pos[coo[0]] - pos[coo[1]]
    w = np.linalg.norm(vec, axis=-1)
    w[coo[0] == coo[1]] = 0.0
    return z, pos, coo, w.astype(np.float32), vec


class _StubDistance(torch.nn.Module):
    def __init__(self, coo, w, vec):
        super().__init__()
        self.out = (t(coo), t(w), t(vec))

    def forward(self, pos, batch):
        return self.out


def _lin(ov, fpath, tname, bias=True):
    ov[f'{fpath}.kernel'] = lambda sd, k=tname: sd[f'{k}.weight'].T
    if bias:
        ov[f'{fpath}.bias'] = lambda sd, k=tname: sd[f'{k}.bias']


def _norm(ov, fpath, tname):
    ov[f'{fpath}.scale'] = lambda sd, k=tname: sd[f'{k}.weight']
    ov[f'{fpath}.bias'] = lambda sd, k=tname: sd[f'{k}.bias']


def _visnet_overrides(num_layers, vertex, last_has_edge=False):
    ov = {}
    P, RP = 'representation', 'representation_model'
    ov[f'{P}.embedding.embedding'] = \
        lambda sd: sd[f'{RP}.embedding.weight']
    ov[f'{P}.nbr_embedding.embedding'] = \
        lambda sd: sd[f'{RP}.neighbor_embedding.embedding.weight']
    _lin(ov, f'{P}.distance_proj', f'{RP}.neighbor_embedding.distance_proj')
    _lin(ov, f'{P}.combine', f'{RP}.neighbor_embedding.combine')
    _lin(ov, f'{P}.edge_proj', f'{RP}.edge_embedding.edge_proj')
    for i in range(num_layers):
        fp, tp = f'{P}.vis_mp_{i}', f'{RP}.vis_mp_layers.{i}'
        _norm(ov, f'{fp}.ln', f'{tp}.layernorm')
        for name in ('q_proj', 'k_proj', 'v_proj', 'dk_proj', 'dv_proj',
                     's_proj', 'o_proj'):
            _lin(ov, f'{fp}.{name}', f'{tp}.{name}')
        _lin(ov, f'{fp}.vec_proj', f'{tp}.vec_proj', bias=False)
        if i < num_layers - 1:
            _lin(ov, f'{fp}.f_proj', f'{tp}.f_proj')
            _lin(ov, f'{fp}.w_trg', f'{tp}.w_trg_proj', bias=False)
            _lin(ov, f'{fp}.w_src', f'{tp}.w_src_proj', bias=False)
            if vertex:
                _lin(ov, f'{fp}.t_trg', f'{tp}.t_trg_proj', bias=False)
                _lin(ov, f'{fp}.t_src', f'{tp}.t_src_proj', bias=False)
    _norm(ov, f'{P}.out_norm', f'{RP}.out_norm')
    for b, rb in (('blk1', '0'), ('blk2', '1')):
        tb = f'output_model.output_network.{rb}'
        _lin(ov, f'output.{b}.vec1', f'{tb}.vec1_proj', bias=False)
        _lin(ov, f'output.{b}.vec2', f'{tb}.vec2_proj', bias=False)
        _lin(ov, f'output.{b}.up1', f'{tb}.update_net.0')
        _lin(ov, f'output.{b}.up2', f'{tb}.update_net.2')
    return ov


@pytest.mark.parametrize('lmax,vecnorm,vertex', [
    (1, None, False),
    (2, 'max_min', True),
])
def test_visnet_full(lmax, vecnorm, vertex):
    C, H, L, RBF = 16, 2, 2, 8
    z, pos, coo, w, vec = _mol()
    ref = rv.ViSNet(lmax=lmax, vecnorm_type=vecnorm,
                    trainable_vecnorm=False, num_heads=H, num_layers=L,
                    hidden_channels=C, num_rbf=RBF, cutoff=5.0,
                    vertex=vertex, derivative=False)
    ref.representation_model.distance = _StubDistance(coo, w, vec)
    ref.eval()
    batch = torch.zeros(len(z), dtype=torch.long)
    with torch.no_grad():
        r, _ = ref(t(z), t(pos), batch)

    ours = pm.ViSNet(lmax=lmax, vecnorm_type=vecnorm, num_heads=H,
                     num_layers=L, hidden_channels=C, num_rbf=RBF,
                     cutoff=5.0, vertex=vertex)
    jz = jnp.asarray(z.astype(np.int32))
    jpos = jnp.asarray(pos)
    jcoo = jnp.asarray(coo.astype(np.int32))
    params = ours.init(jax.random.PRNGKey(0), jz, jpos, jcoo)
    params = transplant(ref, params, _visnet_overrides(L, vertex))
    g = ours.apply(params, jz, jpos, jcoo)
    np.testing.assert_allclose(np.asarray(g), r.numpy(), rtol=1e-3,
                               atol=1e-4)
