"""Numeric parity vs the reference PyTorch Geometric implementation.

BASELINE.md requirement: "Per-layer activations vs reference PyG
forward — allclose". The reference (CPU torch) runs side by side with
our jax implementation on identical weights; nothing is copied — the
reference is imported purely as a test oracle.
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

rng = np.random.default_rng(0)
N, E, F_IN, F_OUT = 20, 60, 8, 16
X = rng.standard_normal((N, F_IN)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)
W = rng.random(E).astype(np.float32)


def t(x):
    return torch.from_numpy(np.asarray(x))


def _dense_params(tconv, names=('lin',)):
    """Extract torch Linear weights into flax param dicts."""
    return None


def test_gcn_conv_parity():
    ref = tg.nn.GCNConv(F_IN, F_OUT, add_self_loops=True)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(W)).numpy()

    ours = pgnn.GCNConv(out_channels=F_OUT)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(COO.astype(np.int32)),
                       edge_weight=jnp.asarray(W))
    # copy reference weights: ref.lin.weight [out, in], bias [out]
    params = {'params': {
        'lin': {'kernel': jnp.asarray(
            ref.lin.weight.detach().numpy().T)},
        'bias': jnp.asarray(ref.bias.detach().numpy()),
    }}
    out = ours.apply(params, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)),
                     edge_weight=jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_sage_conv_parity():
    ref = tg.nn.SAGEConv(F_IN, F_OUT)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()

    ours = pgnn.SAGEConv(out_channels=F_OUT)
    params = {'params': {
        'lin_l': {'kernel': jnp.asarray(
            ref.lin_l.weight.detach().numpy().T),
            'bias': jnp.asarray(ref.lin_l.bias.detach().numpy())},
        'lin_r': {'kernel': jnp.asarray(
            ref.lin_r.weight.detach().numpy().T)},
    }}
    out = ours.apply(params, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_gin_conv_parity():
    mlp = torch.nn.Sequential(torch.nn.Linear(F_IN, F_OUT),
                              torch.nn.ReLU(),
                              torch.nn.Linear(F_OUT, F_OUT))
    ref = tg.nn.GINConv(mlp, eps=0.3)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()

    from pytorch_geometric_tpu.nn.models.mlp import MLP
    ours = pgnn.GINConv(mlp=MLP(channel_list=[F_OUT, F_OUT],
                                plain_last=True), eps_init=0.3)
    params = {'params': {'mlp': {
        'lin_0': {'kernel': jnp.asarray(mlp[0].weight.detach().numpy().T),
                  'bias': jnp.asarray(mlp[0].bias.detach().numpy())},
        'lin_1': {'kernel': jnp.asarray(mlp[2].weight.detach().numpy().T),
                  'bias': jnp.asarray(mlp[2].bias.detach().numpy())},
    }}}
    out = ours.apply(params, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_gat_conv_parity():
    ref = tg.nn.GATConv(F_IN, F_OUT, heads=2, add_self_loops=True)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()

    ours = pgnn.GATConv(out_channels=F_OUT, heads=2)
    # ours keeps separate src/dst projections (bipartite-general); the
    # reference shares one lin — set both to the same weights
    k = jnp.asarray(ref.lin.weight.detach().numpy().T)
    params = {'params': {
        'lin_src': {'kernel': k},
        'att_src': jnp.asarray(ref.att_src.detach().numpy()),
        'att_dst': jnp.asarray(ref.att_dst.detach().numpy()),
        'bias': jnp.asarray(ref.bias.detach().numpy()),
    }}
    out = ours.apply(params, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)


def test_graph_conv_parity():
    ref = tg.nn.GraphConv(F_IN, F_OUT)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(W)).numpy()
    ours = pgnn.GraphConv(out_channels=F_OUT)
    params = {'params': {
        'lin_rel': {'kernel': jnp.asarray(
            ref.lin_rel.weight.detach().numpy().T),
            'bias': jnp.asarray(ref.lin_rel.bias.detach().numpy())},
        'lin_root': {'kernel': jnp.asarray(
            ref.lin_root.weight.detach().numpy().T)},
    }}
    out = ours.apply(params, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)),
                     edge_weight=jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_appnp_sgc_parity():
    ref = tg.nn.APPNP(K=3, alpha=0.2)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    ours = pgnn.APPNP(K=3, alpha=0.2)
    out = ours(jnp.asarray(X), jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-4)

    ref = tg.nn.SGConv(F_IN, F_OUT, K=2)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    ours = pgnn.SGConv(out_channels=F_OUT, K=2)
    params = {'params': {'lin': {
        'kernel': jnp.asarray(ref.lin.weight.detach().numpy().T),
        'bias': jnp.asarray(ref.lin.bias.detach().numpy())}}}
    out = ours.apply(params, jnp.asarray(X),
                     jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-4)


def test_utils_parity():
    from torch_geometric.utils import (degree as ref_degree,
                                       softmax as ref_softmax,
                                       to_undirected as ref_undirected)
    import pytorch_geometric_tpu.utils as U

    d_ref = ref_degree(t(COO[1]), num_nodes=N).numpy()
    d = np.asarray(U.degree(jnp.asarray(COO[1].astype(np.int32)), N))
    np.testing.assert_allclose(d, d_ref)

    alpha = rng.standard_normal(E).astype(np.float32)
    s_ref = ref_softmax(t(alpha), t(COO[1]), num_nodes=N).numpy()
    s = np.asarray(U.softmax(jnp.asarray(alpha),
                             jnp.asarray(COO[1].astype(np.int32)), N))
    np.testing.assert_allclose(s, s_ref, rtol=1e-5, atol=1e-6)

    u_ref = ref_undirected(t(COO), num_nodes=N).numpy()
    u = U.to_undirected(COO, num_nodes=N)
    # same edge set
    assert set(map(tuple, u_ref.T)) == set(map(tuple, u.T))


def test_gcn_model_two_layer_parity():
    """Per-layer activations of a 2-layer GCN (the BASELINE config-1
    check)."""
    ref1 = tg.nn.GCNConv(F_IN, 32)
    ref2 = tg.nn.GCNConv(32, 7)
    with torch.no_grad():
        h_ref = torch.relu(ref1(t(X), t(COO)))
        out_ref = ref2(h_ref, t(COO)).numpy()
        h_ref = h_ref.numpy()

    c1 = pgnn.GCNConv(out_channels=32)
    c2 = pgnn.GCNConv(out_channels=7)
    p1 = {'params': {
        'lin': {'kernel': jnp.asarray(ref1.lin.weight.detach().numpy().T)},
        'bias': jnp.asarray(ref1.bias.detach().numpy())}}
    p2 = {'params': {
        'lin': {'kernel': jnp.asarray(ref2.lin.weight.detach().numpy().T)},
        'bias': jnp.asarray(ref2.bias.detach().numpy())}}
    h = jax.nn.relu(c1.apply(p1, jnp.asarray(X),
                             jnp.asarray(COO.astype(np.int32))))
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-4,
                               atol=1e-4)
    out = c2.apply(p2, h, jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4,
                               atol=1e-4)
