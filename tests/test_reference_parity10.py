"""Parity wave 10 vs the reference PyG oracle: autoencoder family
(InnerProductDecoder, GAE.recon_loss, VGAE.kl_loss, ARGA.reg_loss),
MetaLayer (edge+node+global updates), HeteroJumpingKnowledge, and the
Node2Vec skip-gram loss."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.nn.models as tm
from torch.nn import Linear as Lin
from torch.nn import ReLU
from torch.nn import Sequential as Seq
from torch_geometric.utils import scatter as t_scatter

import flax.linen as fnn
import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.models as pm
from pytorch_geometric_tpu.ops import scatter
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(10)
N, E, D = 12, 30, 8
Z = rng.standard_normal((N, D)).astype(np.float32)
POS = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
NEG = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_inner_product_decoder():
    ref = tm.InnerProductDecoder()
    for sig in (True, False):
        r = ref(t(Z), t(POS), sigmoid=sig).numpy()
        g = pm.InnerProductDecoder.decode(jnp.asarray(Z),
                                          jnp.asarray(POS.astype(np.int32)),
                                          sigmoid=sig)
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-6)
        r = ref.forward_all(t(Z), sigmoid=sig).numpy()
        g = pm.InnerProductDecoder.decode_all(jnp.asarray(Z), sigmoid=sig)
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-5)


def test_gae_recon_loss():
    ref = tm.GAE(torch.nn.Identity())
    r = ref.recon_loss(t(Z), t(POS), t(NEG)).numpy()
    g = pm.GAE.recon_loss(jnp.asarray(Z), jnp.asarray(POS.astype(np.int32)),
                          jnp.asarray(NEG.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


def test_vgae_kl_loss():
    mu = rng.standard_normal((N, D)).astype(np.float32)
    logstd = rng.standard_normal((N, D)).astype(np.float32)
    ref = tm.VGAE(torch.nn.Identity())
    r = ref.kl_loss(t(mu), t(logstd)).numpy()
    g = pm.VGAE.kl_loss(jnp.asarray(mu), jnp.asarray(logstd))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-5, atol=1e-5)


class _Disc(fnn.Module):
    @fnn.compact
    def __call__(self, z):
        h = fnn.relu(fnn.Dense(16, name='lin0')(z))
        return fnn.Dense(1, name='lin1')(h)


def test_arga_reg_loss():
    t_disc = Seq(Lin(D, 16), ReLU(), Lin(16, 1))
    ref = tm.ARGA(torch.nn.Identity(), t_disc)
    with torch.no_grad():
        r = ref.reg_loss(t(Z)).numpy()

    model = pm.ARGA(encoder=None, discriminator=_Disc())
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(Z),
                        method=lambda m, z: m.reg_loss(z))
    params = transplant(
        t_disc, params, {
            'discriminator.lin0.kernel': lambda sd: sd['0.weight'].T,
            'discriminator.lin0.bias': lambda sd: sd['0.bias'],
            'discriminator.lin1.kernel': lambda sd: sd['2.weight'].T,
            'discriminator.lin1.bias': lambda sd: sd['2.bias'],
        })
    g = model.apply(params, jnp.asarray(Z),
                    method=lambda m, z: m.reg_loss(z))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


# ---- MetaLayer: the reference docstring's canonical 3-model example ----
FX, FE, FU, B = 5, 4, 3, 2
BATCH = np.sort(rng.integers(0, B, N))


class _TEdge(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.mlp = Seq(Lin(2 * FX + FE + FU, 8), ReLU(), Lin(8, FE))

    def forward(self, src, dst, edge_attr, u, batch):
        return self.mlp(torch.cat([src, dst, edge_attr, u[batch]], 1))


class _TNode(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.mlp1 = Seq(Lin(FX + FE, 8), ReLU(), Lin(8, 6))
        self.mlp2 = Seq(Lin(FX + 6 + FU, 8), ReLU(), Lin(8, FX))

    def forward(self, x, edge_index, edge_attr, u, batch):
        row, col = edge_index
        out = self.mlp1(torch.cat([x[row], edge_attr], 1))
        out = t_scatter(out, col, dim=0, dim_size=x.size(0), reduce='mean')
        return self.mlp2(torch.cat([x, out, u[batch]], 1))


class _TGlobal(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.mlp = Seq(Lin(FU + FX, 8), ReLU(), Lin(8, FU))

    def forward(self, x, edge_index, edge_attr, u, batch):
        return self.mlp(torch.cat(
            [u, t_scatter(x, batch, dim=0, reduce='mean')], 1))


class _Mlp(fnn.Module):
    out: int

    @fnn.compact
    def __call__(self, h):
        return fnn.Dense(self.out, name='lin1')(
            fnn.relu(fnn.Dense(8, name='lin0')(h)))


class _JEdge(fnn.Module):
    @fnn.compact
    def __call__(self, src, dst, edge_attr, u, batch):
        return _Mlp(FE, name='mlp')(
            jnp.concatenate([src, dst, edge_attr, u[batch]], 1))


class _JNode(fnn.Module):
    @fnn.compact
    def __call__(self, x, edge_index, edge_attr, u, batch):
        row, col = edge_index
        out = _Mlp(6, name='mlp1')(jnp.concatenate([x[row], edge_attr], 1))
        out = scatter(out, col, dim_size=x.shape[0], reduce='mean')
        return _Mlp(FX, name='mlp2')(
            jnp.concatenate([x, out, u[batch]], 1))


class _JGlobal(fnn.Module):
    @fnn.compact
    def __call__(self, x, edge_index, edge_attr, u, batch):
        return _Mlp(FU, name='mlp')(jnp.concatenate(
            [u, scatter(x, batch, dim_size=u.shape[0], reduce='mean')], 1))


def _seq_overrides(prefix, t_prefix):
    return {
        f'{prefix}.lin0.kernel': lambda sd, k=t_prefix: sd[f'{k}.0.weight'].T,
        f'{prefix}.lin0.bias': lambda sd, k=t_prefix: sd[f'{k}.0.bias'],
        f'{prefix}.lin1.kernel': lambda sd, k=t_prefix: sd[f'{k}.2.weight'].T,
        f'{prefix}.lin1.bias': lambda sd, k=t_prefix: sd[f'{k}.2.bias'],
    }


def test_meta_layer():
    x = rng.standard_normal((N, FX)).astype(np.float32)
    ea = rng.standard_normal((E, FE)).astype(np.float32)
    u = rng.standard_normal((B, FU)).astype(np.float32)
    ref = tm.MetaLayer(_TEdge(), _TNode(), _TGlobal())
    with torch.no_grad():
        rx, re, ru = ref(t(x), t(POS), t(ea), t(u), t(BATCH))

    ours = pm.MetaLayer(edge_model=_JEdge(), node_model=_JNode(),
                        global_model=_JGlobal())
    jpos = jnp.asarray(POS.astype(np.int32))
    args = (jnp.asarray(x), jpos, jnp.asarray(ea), jnp.asarray(u),
            jnp.asarray(BATCH.astype(np.int32)))
    params = ours.init(jax.random.PRNGKey(0), *args, batch_size=B)
    ov = {}
    ov.update(_seq_overrides('edge_model.mlp', 'edge_model.mlp'))
    ov.update(_seq_overrides('node_model.mlp1', 'node_model.mlp1'))
    ov.update(_seq_overrides('node_model.mlp2', 'node_model.mlp2'))
    ov.update(_seq_overrides('global_model.mlp', 'global_model.mlp'))
    params = transplant(ref, params, ov)
    gx, ge, gu = ours.apply(params, *args, batch_size=B)
    np.testing.assert_allclose(np.asarray(ge), re.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), rx.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gu), ru.numpy(), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize('mode', ['cat', 'max'])
def test_hetero_jumping_knowledge(mode):
    types = ['paper', 'author']
    xs = {k: [rng.standard_normal((N, D)).astype(np.float32)
              for _ in range(3)] for k in types}
    ref = tm.HeteroJumpingKnowledge(types, mode=mode)
    r = ref({k: [t(v) for v in vs] for k, vs in xs.items()})
    ours = pm.HeteroJumpingKnowledge(types=tuple(types), mode=mode)
    jx = {k: [jnp.asarray(v) for v in vs] for k, vs in xs.items()}
    params = ours.init(jax.random.PRNGKey(0), jx)
    g = ours.apply(params, jx)
    for k in types:
        np.testing.assert_allclose(np.asarray(g[k]), r[k].numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_node2vec_loss():
    # The reference ctor hard-requires pyg-lib/torch-cluster (absent
    # here) just to pick a walk function; loss() only needs the
    # embedding table, so build the module shell directly.
    ref = tm.Node2Vec.__new__(tm.Node2Vec)
    torch.nn.Module.__init__(ref)
    ref.embedding_dim = D
    ref.EPS = 1e-15
    ref.embedding = torch.nn.Embedding(N, D)
    pos_rw = rng.integers(0, N, (10, 4)).astype(np.int64)
    neg_rw = rng.integers(0, N, (10, 4)).astype(np.int64)
    with torch.no_grad():
        r = ref.loss(t(pos_rw), t(neg_rw)).numpy()

    ours = pm.Node2Vec(num_nodes=N, embedding_dim=D, walk_length=6,
                       context_size=4)
    params = ours.init(jax.random.PRNGKey(0))
    params = transplant(ref, params,
                        {'embedding': lambda sd: sd['embedding.weight']})
    g = pm.Node2Vec.loss(params, jnp.asarray(pos_rw.astype(np.int32)),
                         jnp.asarray(neg_rw.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


# ---- RENet: GRU encoder over per-step mean-aggregated histories ----
def _gru_overrides(name):
    """Map torch nn.GRU(l0) weights onto a flax GRUCell named ``name``."""
    def slc(key, i):
        return lambda sd: np.split(sd[f'{name}.{key}'], 3, axis=0)[i]

    def slcT(key, i):
        return lambda sd: np.split(sd[f'{name}.{key}'], 3, axis=0)[i].T

    def bias_rz(i):
        return lambda sd: (np.split(sd[f'{name}.bias_ih_l0'], 3)[i]
                           + np.split(sd[f'{name}.bias_hh_l0'], 3)[i])

    return {
        f'{name}.ir.kernel': slcT('weight_ih_l0', 0),
        f'{name}.iz.kernel': slcT('weight_ih_l0', 1),
        f'{name}.in.kernel': slcT('weight_ih_l0', 2),
        f'{name}.hr.kernel': slcT('weight_hh_l0', 0),
        f'{name}.hz.kernel': slcT('weight_hh_l0', 1),
        f'{name}.hn.kernel': slcT('weight_hh_l0', 2),
        f'{name}.ir.bias': bias_rz(0),
        f'{name}.iz.bias': bias_rz(1),
        f'{name}.in.bias': lambda sd: np.split(
            sd[f'{name}.bias_ih_l0'], 3)[2],
        f'{name}.hn.bias': lambda sd: np.split(
            sd[f'{name}.bias_hh_l0'], 3)[2],
    }


def test_renet():
    from torch_geometric.data import Data
    NN, R, H, L, BS, K = 20, 4, 8, 3, 5, 4
    r2 = np.random.default_rng(42)
    sub = r2.integers(0, NN, BS)
    rel = r2.integers(0, R, BS)
    obj = r2.integers(0, NN, BS)

    def make_hist():
        flat_ids, flat_t, flat_b = [], [], []
        pad_ids = np.zeros((BS, L, K), np.int64)
        mask = np.zeros((BS, L, K), bool)
        for b in range(BS):
            for step in range(L):
                c = int(r2.integers(0, K + 1))
                ids = r2.integers(0, NN, c)
                pad_ids[b, step, :c] = ids
                mask[b, step, :c] = True
                flat_ids += list(ids)
                flat_t += [step] * c
                flat_b += [b] * c
        return (pad_ids, mask, np.asarray(flat_ids, np.int64),
                np.asarray(flat_t, np.int64), np.asarray(flat_b, np.int64))

    hs_pad, hs_mask, hs_f, hs_t, hs_b = make_hist()
    ho_pad, ho_mask, ho_f, ho_t, ho_b = make_hist()

    ref = tm.RENet(NN, R, hidden_channels=H, seq_len=L, dropout=0.0)
    ref.eval()
    data = Data(sub=t(sub), rel=t(rel), obj=t(obj), h_sub=t(hs_f),
                h_sub_t=t(hs_t), h_sub_batch=t(hs_b), h_obj=t(ho_f),
                h_obj_t=t(ho_t), h_obj_batch=t(ho_b))
    with torch.no_grad():
        r_obj, r_sub = ref(data)

    ours = pm.RENet(num_nodes=NN, num_rels=R, hidden_channels=H,
                    seq_len=L, dropout=0.0)
    ja = lambda a: jnp.asarray(a.astype(np.int32))
    args = (ja(sub), ja(rel), ja(obj), ja(hs_pad), jnp.asarray(hs_mask),
            ja(ho_pad), jnp.asarray(ho_mask))
    params = ours.init(jax.random.PRNGKey(0), *args)
    ov = {'ent': lambda sd: sd['ent'], 'rel': lambda sd: sd['rel']}
    ov.update(_gru_overrides('sub_gru'))
    ov.update(_gru_overrides('obj_gru'))
    params = transplant(ref, params, ov)
    g_obj, g_sub = ours.apply(params, *args)
    np.testing.assert_allclose(np.asarray(g_obj), r_obj.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sub), r_sub.numpy(),
                               rtol=1e-4, atol=1e-5)
