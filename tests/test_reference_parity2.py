"""Second parity batch vs reference PyG: GATv2, Transformer, Cheb, TAG,
RGCN, GIN-E, norms, pooling, aggregations."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn as pgnn

rng = np.random.default_rng(1)
N, E, F_IN, F_OUT = 18, 50, 6, 10
X = rng.standard_normal((N, F_IN)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


def j32(x):
    return jnp.asarray(np.asarray(x).astype(np.int32))


def lin(ref_lin):
    d = {'kernel': jnp.asarray(ref_lin.weight.detach().numpy().T)}
    if ref_lin.bias is not None:
        d['bias'] = jnp.asarray(ref_lin.bias.detach().numpy())
    return d


def test_gatv2_parity():
    ref = tg.nn.GATv2Conv(F_IN, F_OUT, heads=2)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    ours = pgnn.GATv2Conv(out_channels=F_OUT, heads=2)
    params = {'params': {
        'lin_l': lin(ref.lin_l),
        'lin_r': lin(ref.lin_r),
        'att': jnp.asarray(ref.att.detach().numpy()),
        'bias': jnp.asarray(ref.bias.detach().numpy()),
    }}
    out = ours.apply(params, jnp.asarray(X), j32(COO))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)


def test_transformer_parity():
    ref = tg.nn.TransformerConv(F_IN, F_OUT, heads=2)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    ours = pgnn.TransformerConv(out_channels=F_OUT, heads=2)
    params = {'params': {
        'lin_query': lin(ref.lin_query),
        'lin_key': lin(ref.lin_key),
        'lin_value': lin(ref.lin_value),
        'lin_skip': lin(ref.lin_skip),
    }}
    out = ours.apply(params, jnp.asarray(X), j32(COO))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)


def test_cheb_tag_parity():
    ref = tg.nn.ChebConv(F_IN, F_OUT, K=3)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    ours = pgnn.ChebConv(out_channels=F_OUT, K=3)
    params = {'params': {
        **{f'lin_{k}': lin(ref.lins[k]) for k in range(3)},
        'bias': jnp.asarray(ref.bias.detach().numpy()),
    }}
    out = ours.apply(params, jnp.asarray(X), j32(COO))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)

    ref = tg.nn.TAGConv(F_IN, F_OUT, K=2)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    ours = pgnn.TAGConv(out_channels=F_OUT, K=2)
    params = {'params': {
        **{f'lin_{k}': lin(ref.lins[k]) for k in range(3)},
        'bias': jnp.asarray(ref.bias.detach().numpy()),
    }}
    out = ours.apply(params, jnp.asarray(X), j32(COO))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)


def test_rgcn_parity():
    R = 3
    etype = rng.integers(0, R, E)
    ref = tg.nn.RGCNConv(F_IN, F_OUT, num_relations=R)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(etype)).numpy()
    ours = pgnn.RGCNConv(out_channels=F_OUT, num_relations=R)
    params = {'params': {
        'weight': jnp.asarray(ref.weight.detach().numpy()),
        'root': {'kernel': jnp.asarray(ref.root.detach().numpy())},
        'bias': jnp.asarray(ref.bias.detach().numpy()),
    }}
    out = ours.apply(params, jnp.asarray(X), j32(COO),
                     j32(etype))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)


def test_gine_parity():
    mlp = torch.nn.Linear(F_IN, F_OUT)
    ea = rng.standard_normal((E, F_IN)).astype(np.float32)
    ref = tg.nn.GINEConv(mlp, eps=0.1)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO), t(ea)).numpy()
    from pytorch_geometric_tpu.nn.models.mlp import MLP
    ours = pgnn.GINEConv(mlp=MLP(channel_list=[F_OUT]), eps_init=0.1)
    params = {'params': {'mlp': {'lin_0': lin(mlp)}}}
    out = ours.apply(params, jnp.asarray(X), j32(COO),
                     jnp.asarray(ea))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)


def test_norm_parity():
    from pytorch_geometric_tpu.nn.norm import (GraphNorm, PairNorm,
                                               MeanSubtractionNorm)
    batch = np.sort(rng.integers(0, 2, N)).astype(np.int64)

    ref = tg.nn.norm.PairNorm()
    with torch.no_grad():
        ref_out = ref(t(X)).numpy()
    out = PairNorm()(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)

    ref = tg.nn.norm.MeanSubtractionNorm()
    with torch.no_grad():
        ref_out = ref(t(X)).numpy()
    out = MeanSubtractionNorm()(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-5)

    ref = tg.nn.norm.GraphNorm(F_IN)
    with torch.no_grad():
        ref_out = ref(t(X), t(batch)).numpy()
    mod = GraphNorm()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(X),
                      j32(batch), 2)
    out = mod.apply(params, jnp.asarray(X), j32(batch), 2)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-3)


def test_pool_and_aggr_parity():
    from pytorch_geometric_tpu.nn.pool import (global_add_pool,
                                               global_mean_pool,
                                               global_max_pool)
    batch = np.sort(rng.integers(0, 3, N)).astype(np.int64)
    for ref_fn, our_fn in (
            (tg.nn.global_add_pool, global_add_pool),
            (tg.nn.global_mean_pool, global_mean_pool),
            (tg.nn.global_max_pool, global_max_pool)):
        ref_out = ref_fn(t(X), t(batch)).numpy()
        out = our_fn(jnp.asarray(X), j32(batch), 3)
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5,
                                   atol=1e-6)

    # softmax aggregation
    from pytorch_geometric_tpu.nn.aggr import SoftmaxAggregation
    ref = tg.nn.aggr.SoftmaxAggregation(t=1.0)
    with torch.no_grad():
        ref_out = ref(t(X), t(batch)).numpy()
    mod = SoftmaxAggregation(t=1.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(X),
                      j32(batch), 3)
    out = mod.apply(params, jnp.asarray(X), j32(batch), 3)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-5)


def test_transforms_parity():
    import pytorch_geometric_tpu.transforms as T
    from pytorch_geometric_tpu.data import Data as JData
    from torch_geometric.data import Data as TData

    td = TData(x=t(X), edge_index=t(COO))
    jd = JData(x=X, edge_index=COO.astype(np.int32), num_nodes=N)

    ref = tg.transforms.NormalizeFeatures()(td).x.numpy()
    out = np.asarray(T.NormalizeFeatures()(jd).x)
    # our impl shifts by min first only when negative (same as ref)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    ref = tg.transforms.AddRandomWalkPE(walk_length=3)(td)
    out = T.AddRandomWalkPE(walk_length=3)(jd)
    np.testing.assert_allclose(np.asarray(out.random_walk_pe),
                               ref.random_walk_pe.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_dense_diff_pool_parity():
    from pytorch_geometric_tpu.nn.dense import dense_diff_pool
    B, NN, K = 2, 8, 3
    x = rng.standard_normal((B, NN, F_IN)).astype(np.float32)
    adj = (rng.random((B, NN, NN)) < 0.4).astype(np.float32)
    s = rng.standard_normal((B, NN, K)).astype(np.float32)
    ref_x, ref_adj, ref_l1, ref_l2 = tg.nn.dense_diff_pool(
        t(x), t(adj), t(s))
    out_x, out_adj, l1, l2 = dense_diff_pool(
        jnp.asarray(x), jnp.asarray(adj), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out_x), ref_x.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_adj), ref_adj.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(l1), float(ref_l1), rtol=1e-3)
    np.testing.assert_allclose(float(l2), float(ref_l2), rtol=1e-3)
