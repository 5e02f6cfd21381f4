"""Smoke + semantics tests for the wide conv families."""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_geometric_tpu.nn as pgnn
from pytorch_geometric_tpu.nn.models.mlp import MLP

rng = np.random.default_rng(0)
N, E, F = 12, 40, 8
X = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
COO = jnp.asarray(np.stack([rng.integers(0, N, E),
                            rng.integers(0, N, E)]).astype(np.int32))
W = jnp.asarray(rng.random(E).astype(np.float32))
EATTR = jnp.asarray(rng.standard_normal((E, 5)).astype(np.float32))
ETYPE = jnp.asarray(rng.integers(0, 3, E).astype(np.int32))
POS = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))


def run(mod, *args, **kw):
    params = mod.init(jax.random.PRNGKey(0), *args, **kw)
    return mod.apply(params, *args, **kw)


SIMPLE_CONVS = [
    pgnn.GraphConv(out_channels=16),
    pgnn.ResGatedGraphConv(out_channels=16),
    pgnn.LEConv(out_channels=16),
    pgnn.MFConv(out_channels=16, max_degree=5),
    pgnn.AGNNConv(),
    pgnn.ClusterGCNConv(out_channels=16),
    pgnn.WLConvContinuous(),
    pgnn.LGConv(),
    pgnn.ChebConv(out_channels=16, K=3),
    pgnn.ARMAConv(out_channels=16, num_stacks=2, num_layers=2),
    pgnn.SGConv(out_channels=16, K=2),
    pgnn.SSGConv(out_channels=16, alpha=0.2, K=2),
    pgnn.TAGConv(out_channels=16, K=2),
    pgnn.APPNP(K=3, alpha=0.2),
    pgnn.MixHopConv(out_channels=16, powers=(0, 1, 2)),
    pgnn.TransformerConv(out_channels=8, heads=2),
    pgnn.EGConv(out_channels=16, num_heads=4, num_bases=2),
]


@pytest.mark.parametrize('conv', SIMPLE_CONVS,
                         ids=lambda c: type(c).__name__)
def test_conv_smoke(conv):
    out = run(conv, X, COO)
    assert out.shape[0] == N
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize('conv', SIMPLE_CONVS,
                         ids=lambda c: type(c).__name__)
def test_conv_padding_invariance(conv):
    """Appending masked padding edges must not change the output."""
    pad = jnp.full((2, 7), N, jnp.int32)
    coo_p = jnp.concatenate([COO, pad], axis=1)
    mask = jnp.concatenate([jnp.ones((E,), bool), jnp.zeros((7,), bool)])
    params = conv.init(jax.random.PRNGKey(0), X, COO)
    out = conv.apply(params, X, COO)
    out_p = conv.apply(params, X, coo_p, edge_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p),
                               rtol=2e-4, atol=2e-5)


def test_gated_graph_conv():
    out = run(pgnn.GatedGraphConv(out_channels=16, num_layers=2), X, COO)
    assert out.shape == (N, 16)


def test_fa_conv():
    out = run(pgnn.FAConv(eps=0.2), X, COO)
    assert out.shape == X.shape


def test_rgcn_variants():
    out = run(pgnn.RGCNConv(out_channels=16, num_relations=3), X, COO,
              ETYPE)
    assert out.shape == (N, 16)
    out = run(pgnn.RGCNConv(out_channels=16, num_relations=3, num_bases=2),
              X, COO, ETYPE)
    assert out.shape == (N, 16)
    out = run(pgnn.RGCNConv(out_channels=16, num_relations=3,
                            num_blocks=2), X, COO, ETYPE)
    assert out.shape == (N, 16)


def test_gen_film_pdn_general_pna():
    out = run(pgnn.GENConv(out_channels=16), X, COO, EATTR)
    assert out.shape == (N, 16)
    out = run(pgnn.FiLMConv(out_channels=16, num_relations=3), X, COO,
              ETYPE)
    assert out.shape == (N, 16)
    out = run(pgnn.PDNConv(out_channels=16), X, COO, EATTR)
    assert out.shape == (N, 16)
    out = run(pgnn.GeneralConv(out_channels=16, attention=True), X, COO)
    assert out.shape == (N, 16)
    out = run(pgnn.PNAConv(out_channels=16, towers=2), X, COO)
    assert out.shape == (N, 16)


def test_signed_dir_antisym():
    neg = jnp.asarray(np.stack([rng.integers(0, N, E // 2),
                                rng.integers(0, N, E // 2)]).astype(
                                    np.int32))
    out = run(pgnn.SignedConv(out_channels=16, first_aggr=True), X, COO,
              neg)
    assert out.shape == (N, 32)
    out = run(pgnn.DirGNNConv(conv=pgnn.GraphConv(out_channels=16)), X,
              COO)
    assert out.shape == (N, 16)
    out = run(pgnn.AntiSymmetricConv(
        phi=pgnn.GraphConv(out_channels=F), num_iters=2), X, COO)
    assert out.shape == X.shape


def test_hypergraph_wl():
    out = run(pgnn.HypergraphConv(out_channels=16), X, COO, num_edges=N)
    assert out.shape == (N, 16)
    wl = pgnn.WLConv()
    colors = wl(np.zeros(N, np.int64), np.asarray(COO))
    assert colors.shape == (N,)
    hist = wl.histogram(colors)
    assert hist.sum() == N


def test_point_convs():
    mlp = MLP(channel_list=[16, 16])
    out = run(pgnn.PointNetConv(local_nn=MLP(channel_list=[16])), X, POS,
              COO)
    assert out.shape == (N, 16)
    out = run(pgnn.EdgeConv(nn=MLP(channel_list=[16])), X, COO)
    assert out.shape == (N, 16)
    out = run(pgnn.DynamicEdgeConv(nn=MLP(channel_list=[16]), k=3), X)
    assert out.shape == (N, 16)
    nrm = POS / jnp.linalg.norm(POS, axis=-1, keepdims=True)
    out = run(pgnn.PPFConv(local_nn=MLP(channel_list=[16])), X, POS, nrm,
              COO)
    assert out.shape == (N, 16)
    out = run(pgnn.PointTransformerConv(out_channels=16), X, POS, COO)
    assert out.shape == (N, 16)
    out = run(pgnn.GravNetConv(out_channels=16, k=3), X)
    assert out.shape == (N, 16)


def test_appnp_matches_power_iteration():
    """APPNP against a dense numpy reference."""
    n = 6
    coo = np.array([[0, 1, 2, 3, 4, 5, 0, 2],
                    [1, 2, 3, 4, 5, 0, 2, 4]], np.int32)
    x = rng.standard_normal((n, 3)).astype(np.float32)
    # dense gcn_norm with self loops
    a = np.zeros((n, n), np.float32)
    for s, d in coo.T:
        a[s, d] += 1
    a += np.eye(n)
    deg = a.sum(0)
    dis = 1 / np.sqrt(deg)
    ah = dis[None, :] * a * dis[:, None]   # row=src scaling, col=dst
    z = x.copy()
    for _ in range(3):
        z = 0.8 * (ah.T @ z) + 0.2 * x
    out = run(pgnn.APPNP(K=3, alpha=0.2), jnp.asarray(x),
              jnp.asarray(coo))
    np.testing.assert_allclose(np.asarray(out), z, rtol=1e-4, atol=1e-5)
