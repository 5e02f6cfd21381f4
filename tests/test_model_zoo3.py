"""New model families: ViSNet, GNNFF, RENet, LPFormer, GPSE, GLEM,
MeshCNNConv, fused TransformerConv dispatch (reference
``test/nn/models/test_visnet.py``, ``test_gnnff.py``, ``test_re_net.py``,
``test_lpformer.py``, ``test_gpse.py``, ``test/llm/models/test_glem.py``,
``test/nn/conv/test_meshcnn_conv.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

rng = np.random.default_rng(0)


class TestViSNet:
    def setup_method(self):
        from pytorch_geometric_tpu.nn.pool import radius_graph
        self.n = 16
        self.z = jnp.asarray(rng.integers(1, 10, self.n))
        self.pos = jnp.asarray(
            rng.normal(size=(self.n, 3)).astype(np.float32) * 2)
        self.coo, self.emask = radius_graph(self.pos, r=5.0,
                                            max_num_neighbors=8)

    def test_energy_invariances_and_forces(self):
        from pytorch_geometric_tpu.nn.models import ViSNet
        m = ViSNet(hidden_channels=32, num_heads=4, num_layers=2)
        params = m.init(jax.random.PRNGKey(0), self.z, self.pos,
                        self.coo, self.emask)
        efn = lambda pos: m.apply(params, self.z, pos, self.coo,
                                  self.emask)[0, 0]
        e0 = efn(self.pos)
        assert np.isfinite(float(e0))
        # translation invariance
        assert abs(float(efn(self.pos + jnp.asarray([1., -2., 0.5]))
                         - e0)) < 1e-3
        # rotation invariance + force covariance
        th = 0.9
        R = jnp.asarray([[np.cos(th), -np.sin(th), 0],
                         [np.sin(th), np.cos(th), 0],
                         [0, 0, 1]], jnp.float32)
        assert abs(float(efn(self.pos @ R.T) - e0)) < 1e-3
        F = -jax.grad(efn)(self.pos)
        F_rot = -jax.grad(efn)(self.pos @ R.T)
        assert float(jnp.abs(F_rot - F @ R.T).max()) < 1e-3

    def test_vertex_variant(self):
        from pytorch_geometric_tpu.nn.models import ViSNet
        m = ViSNet(hidden_channels=16, num_heads=2, num_layers=2,
                   vertex=True)
        params = m.init(jax.random.PRNGKey(0), self.z, self.pos,
                        self.coo, self.emask)
        y = m.apply(params, self.z, self.pos, self.coo, self.emask)
        assert np.isfinite(float(y[0, 0]))


def test_gnnff_forces():
    from pytorch_geometric_tpu.nn.models import GNNFF
    n, e = 10, 30
    coo = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    kj, ji, tm = GNNFF.triplets(coo, n, max_triplets=100)
    z = jnp.asarray(rng.integers(1, 12, n))
    pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    m = GNNFF(hidden_node_channels=16, hidden_edge_channels=16,
              num_layers=2)
    params = m.init(jax.random.PRNGKey(0), z, pos, jnp.asarray(coo),
                    jnp.asarray(kj), jnp.asarray(ji), jnp.asarray(tm))
    F = m.apply(params, z, pos, jnp.asarray(coo), jnp.asarray(kj),
                jnp.asarray(ji), jnp.asarray(tm))
    assert F.shape == (n, 3) and bool(jnp.isfinite(F).all())


def test_renet():
    from pytorch_geometric_tpu.nn.models import RENet
    B, L, K = 4, 3, 5
    r = RENet(num_nodes=40, num_rels=6, hidden_channels=16, seq_len=L)
    args = (jnp.asarray(rng.integers(0, 40, B)),
            jnp.asarray(rng.integers(0, 6, B)),
            jnp.asarray(rng.integers(0, 40, B)),
            jnp.asarray(rng.integers(0, 40, (B, L, K))),
            jnp.asarray(rng.random((B, L, K)) < 0.7),
            jnp.asarray(rng.integers(0, 40, (B, L, K))),
            jnp.asarray(rng.random((B, L, K)) < 0.7))
    params = r.init(jax.random.PRNGKey(1), *args)
    lo, ls = r.apply(params, *args)
    assert lo.shape == (B, 40)
    np.testing.assert_allclose(np.exp(np.asarray(lo)).sum(-1),
                               np.ones(B), rtol=1e-4)
    metrics = RENet.test(lo, jnp.asarray(rng.integers(0, 40, B)))
    assert metrics.shape == (4,)
    assert 0 <= float(metrics[0]) <= 1


def test_lpformer_learns():
    import optax
    from pytorch_geometric_tpu.nn.models import (LPFormer,
                                                 build_link_context)
    from pytorch_geometric_tpu.utils.extra import ppr
    N, E, F = 40, 160, 8
    coo = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    (pr, pc), pv = ppr(jnp.asarray(coo), N)
    P = np.zeros((N, N), np.float32)
    P[pr, pc] = pv
    pos = coo[:, rng.choice(E, 8, replace=False)]
    neg = np.stack([rng.integers(0, N, 8), rng.integers(0, N, 8)])
    pairs = np.concatenate([pos, neg], 1)
    y = jnp.asarray(np.concatenate([np.ones(8), np.zeros(8)])
                    .astype(np.float32))
    ctx = build_link_context(coo, N, pairs, P, k_cn=8, k_onehop=8,
                             k_non1hop=4)
    m = LPFormer(in_channels=F, hidden_channels=16)
    args = (jnp.asarray(pairs), x, jnp.asarray(coo)) + tuple(
        jnp.asarray(a) for a in ctx)
    params = m.init(jax.random.PRNGKey(0), *args)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def lf(p):
            return optax.sigmoid_binary_cross_entropy(
                m.apply(p, *args), y).mean()
        l, g = jax.value_and_grad(lf)(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, l

    l0 = None
    for _ in range(40):
        params, opt, l = step(params, opt)
        l0 = l0 if l0 is not None else float(l)
    assert float(l) < l0 * 0.6


def test_gpse_pipeline():
    from pytorch_geometric_tpu.data import Data
    from pytorch_geometric_tpu.nn.models import (GPSE, GPSENodeEncoder,
                                                 precompute_gpse)
    N, E = 20, 60
    d = Data(x=rng.normal(size=(N, 5)).astype(np.float32),
             edge_index=np.stack([rng.integers(0, N, E),
                                  rng.integers(0, N, E)]))
    m = GPSE(dim_in=12, dim_hidden=16, dim_out=8, num_layers=2)
    x0 = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x0, jnp.asarray(d.edge_index))
    d = precompute_gpse(m, params, d)
    assert d.pestat_GPSE.shape == (N, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d.pestat_GPSE), axis=-1),
        np.ones(N), rtol=1e-4)
    enc = GPSENodeEncoder(dim_emb=32, dim_pe_in=8, dim_pe_out=12,
                          dim_in=5, expand_x=True)
    ep = enc.init(jax.random.PRNGKey(1), jnp.asarray(d.x), d.pestat_GPSE)
    assert enc.apply(ep, jnp.asarray(d.x),
                     d.pestat_GPSE).shape == (N, 32)


def test_glem_em():
    from pytorch_geometric_tpu.llm import GLEM
    from pytorch_geometric_tpu.nn.models import GCN
    N, E, F, C = 30, 120, 6, 3
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ei = jnp.asarray(np.stack([rng.integers(0, N, E),
                               rng.integers(0, N, E)]))
    y = jnp.asarray(rng.integers(0, C, N))
    is_gold = jnp.asarray(np.arange(N) < 15)
    gnn = GCN(hidden_channels=8, num_layers=2, out_channels=C)
    params = gnn.init(jax.random.PRNGKey(0), x, ei)

    def lm_logits(node_ids):
        return jax.nn.one_hot(y[node_ids], C) * 2.0

    g = GLEM(gnn, params, lm_logits, lr=5e-2)
    l0 = g.em_round(x, ei, y, is_gold, gnn_steps=15)
    l1 = g.em_round(x, ei, y, is_gold, gnn_steps=15)
    assert l1 < l0
    assert g.inference('gnn', x, ei).shape == (N, C)
    assert g.inference('lm', x, ei).shape == (N, C)


def test_meshcnn_conv_layouts():
    from pytorch_geometric_tpu.nn.conv import MeshCNNConv
    E = 24
    x = jnp.asarray(rng.normal(size=(E, 6)).astype(np.float32))
    ring = jnp.asarray(rng.integers(0, E, (E, 4)))
    m = MeshCNNConv(out_channels=5)
    p = m.init(jax.random.PRNGKey(0), x, ring)
    o1 = m.apply(p, x, ring)
    adj = jnp.stack([jnp.repeat(jnp.arange(E), 4), ring.reshape(-1)])
    o2 = m.apply(p, x, adj)
    assert o1.shape == (E, 5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_transformer_conv_fused_parity():
    from pytorch_geometric_tpu import backend
    from pytorch_geometric_tpu.edge_index import EdgeIndex
    from pytorch_geometric_tpu.nn.conv import TransformerConv
    N, E = 100, 600
    ei = EdgeIndex(jnp.asarray(np.stack([rng.integers(0, N, E),
                                         rng.integers(0, N, E)])),
                   (N, N)).fill_cache(blocked=True)
    x = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    m = TransformerConv(out_channels=4, heads=2)
    p = m.init(jax.random.PRNGKey(0), x, ei)
    try:
        backend.use_pallas_spmm = True
        o1 = m.apply(p, x, ei)
        backend.use_pallas_spmm = False
        o2 = m.apply(p, x, ei)
    finally:
        backend.use_pallas_spmm = None
    assert float(jnp.abs(o1 - o2).max()) < 1e-4
