"""Pooling-operator parity vs the reference PyG oracle.

Covers SelectTopK, TopKPooling, SAGPooling, EdgePooling, ASAPooling,
MemPooling (+kl_loss), ClusterPooling, avg_pool/max_pool(+_x),
avg/max_pool_neighbor_x. graclus/voxel_grid/fps/knn have no oracle here
(reference delegates them to torch-cluster, absent in this env); PAN
pooling's reference needs torch_sparse (absent) — both stay behavioral.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.pool as P
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(11)
N, F, E = 14, 6, 40
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
BATCH = np.zeros(N, np.int64)


def t(x, dtype=None):
    out = torch.from_numpy(np.asarray(x))
    return out.to(dtype) if dtype is not None else out


def test_select_topk():
    from torch_geometric.nn.pool.select import SelectTopK as RefSelect
    ref = RefSelect(F, ratio=0.5)
    ref.eval()
    with torch.no_grad():
        r = ref(t(X), t(BATCH))
    ours = P.SelectTopK(F, ratio=0.5)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(BATCH), 1, N)
    params = transplant(ref, params,
                        overrides={'weight': lambda sd: sd['weight'].T})
    sel = ours.apply(params, jnp.asarray(X), jnp.asarray(BATCH), 1, N)
    ours_idx = np.asarray(sel.node_index)[np.asarray(sel.mask)]
    ours_w = np.asarray(sel.weight)[np.asarray(sel.mask)]
    np.testing.assert_array_equal(ours_idx, r.node_index.numpy())
    np.testing.assert_allclose(ours_w, r.weight.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def _edge_set(coo):
    return set(map(tuple, np.asarray(coo).T.tolist()))


@pytest.mark.parametrize('cls_name', ['TopKPooling', 'SAGPooling'])
def test_topk_sag_pooling(cls_name):
    import torch_geometric.nn as RN
    ref = getattr(RN, cls_name)(F, ratio=0.5)
    ref.eval()
    with torch.no_grad():
        rx, rei, rea, rb, rperm, rscore = ref(t(X), t(COO), batch=t(BATCH))
    ours = getattr(P, cls_name)(F, ratio=0.5)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(COO.astype(np.int32)))
    params = transplant(ref, params, overrides={
        'select.weight': lambda sd: sd['select.weight'].T})
    out = ours.apply(params, jnp.asarray(X), jnp.asarray(COO.astype(np.int32)))
    mask = np.asarray(out.node_mask)
    np.testing.assert_array_equal(np.asarray(out.perm)[mask], rperm.numpy())
    np.testing.assert_allclose(np.asarray(out.x)[mask], rx.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.score)[mask],
                               rscore.detach().numpy(), rtol=1e-4, atol=1e-5)
    keep = np.asarray(out.edge_mask)
    assert _edge_set(np.asarray(out.edge_index)[:, keep]) == \
        _edge_set(rei.numpy())


def test_edge_pooling_softmax_score():
    """Default (softmax) scores match; the greedy merge is tested with
    the tanh scorer below because per-dst softmax puts every
    single-in-degree node at exactly 1.5 and torch's argsort tie order
    is undocumented."""
    import torch_geometric.nn as RN
    coo_u = np.unique(COO.T, axis=0).T
    ref = RN.EdgePooling(F)
    ref.eval()
    from torch_geometric.utils import softmax as ref_softmax
    with torch.no_grad():
        raw = ref.lin(torch.cat([t(X)[t(coo_u)[0]], t(X)[t(coo_u)[1]]],
                                -1)).view(-1)
        ref_score = (ref_softmax(raw, t(coo_u)[1], num_nodes=N)
                     + 0.5).numpy()
    ours = P.EdgePooling(F)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(coo_u.astype(np.int32)))
    params = transplant(ref, params)
    score = np.asarray(ours.apply(params, jnp.asarray(X),
                                  jnp.asarray(coo_u.astype(np.int32))))
    np.testing.assert_allclose(score, ref_score, rtol=1e-5, atol=1e-6)


def test_edge_pooling():
    import torch_geometric.nn as RN
    # duplicate (src, dst) pairs produce exactly-tied scores whose greedy
    # pick order is undefined — use unique edges + the tie-free tanh scorer
    coo_u = np.unique(COO.T, axis=0).T
    ref = RN.EdgePooling(
        F, edge_score_method=RN.EdgePooling.compute_edge_score_tanh,
        add_to_edge_score=0.0)
    ref.eval()
    with torch.no_grad():
        rx, rei, rb, rinfo = ref(t(X), t(coo_u), t(BATCH))
    ours = P.EdgePooling(F, edge_score_method='tanh', add_to_edge_score=0.0)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(coo_u.astype(np.int32)))
    params = transplant(ref, params)
    score = np.asarray(ours.apply(params, jnp.asarray(X),
                                  jnp.asarray(coo_u.astype(np.int32))))
    new_x, new_coo, cluster = P.EdgePooling.merge(X, coo_u, score)
    np.testing.assert_array_equal(cluster, rinfo.cluster.numpy())
    np.testing.assert_allclose(new_x, rx.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(new_coo, rei.numpy())


def test_asap_pooling():
    import torch_geometric.nn as RN
    from torch_geometric.utils import to_dense_adj
    ref = RN.ASAPooling(F, ratio=0.5)
    ref.eval()
    # pass explicit weights: with edge_weight=None the reference discards
    # the coarsened weights (asap.py:154), leaving nothing to compare
    w = rng.uniform(0.5, 1.5, E).astype(np.float32)
    with torch.no_grad():
        rx, rei, rew, rb, rperm = ref(t(X), t(COO), edge_weight=t(w),
                                      batch=t(BATCH))
    ours = P.ASAPooling(in_channels=F, ratio=0.5)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(COO.astype(np.int32)))
    params = transplant(
        ref, params,
        overrides={'select.weight': lambda sd: sd['select.weight'].T})
    new_x, adj, batch, mask, perm, fitness = ours.apply(
        params, jnp.asarray(X), jnp.asarray(COO.astype(np.int32)),
        edge_weight=jnp.asarray(w))
    mask = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(perm)[mask], rperm.numpy())
    np.testing.assert_allclose(np.asarray(new_x)[mask], rx.numpy(),
                               rtol=1e-4, atol=1e-5)
    k = int(mask.sum())
    ref_adj = to_dense_adj(rei, edge_attr=rew, max_num_nodes=k)[0].numpy()
    np.testing.assert_allclose(np.asarray(adj)[:k, :k], ref_adj,
                               rtol=1e-4, atol=1e-5)


def test_mem_pooling():
    import torch_geometric.nn as RN
    H, K, OUT = 3, 4, 5
    ref = RN.MemPooling(F, OUT, heads=H, num_clusters=K)
    ref.eval()
    with torch.no_grad():
        rx, rs = ref(t(X), t(BATCH))
    ours = P.MemPooling(in_channels=F, out_channels=OUT, heads=H,
                        num_clusters=K)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(BATCH))
    sd = {k_: v.detach().numpy() for k_, v in ref.state_dict().items()}
    assert sd['k'].shape == (H, K, F)
    params = transplant(ref, params, overrides={
        'keys': sd['k'],
        'head_mix': sd['conv.weight'].reshape(H),
    })
    out, s = ours.apply(params, jnp.asarray(X), jnp.asarray(BATCH))
    np.testing.assert_allclose(np.asarray(out), rx.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), rs.numpy(),
                               rtol=1e-4, atol=1e-5)
    kl_ref = float(RN.MemPooling.kl_loss(rs))
    kl_ours = float(P.MemPooling.kl_loss(s))
    assert abs(kl_ref - kl_ours) < 1e-5


def test_cluster_pooling():
    import torch_geometric.nn as RN
    ref = RN.ClusterPooling(F)
    ref.eval()
    with torch.no_grad():
        rx, rei, rb, rinfo = ref(t(X), t(COO), t(BATCH))
    ours = P.ClusterPooling(in_channels=F)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(X),
                       jnp.asarray(COO.astype(np.int32)))
    params = transplant(ref, params)
    pooled, cluster, new_coo, new_mask, k = ours.apply(
        params, jnp.asarray(X), jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(cluster),
                                  rinfo.cluster.numpy())
    assert k == rx.shape[0]
    np.testing.assert_allclose(np.asarray(pooled)[:k], rx.numpy(),
                               rtol=1e-4, atol=1e-5)
    keep = np.asarray(new_mask)
    assert _edge_set(np.asarray(new_coo)[:, keep]) == _edge_set(rei.numpy())


def test_avg_max_pool():
    from torch_geometric.data import Data as RefData
    from torch_geometric.nn import avg_pool as ref_avg, max_pool as ref_max
    from pytorch_geometric_tpu.data import Data
    cluster = rng.integers(0, 5, N) * 3   # non-consecutive on purpose
    pos = rng.standard_normal((N, 3)).astype(np.float32)
    rdata = RefData(x=t(X), edge_index=t(COO), pos=t(pos))
    data = Data(x=jnp.asarray(X), edge_index=jnp.asarray(
        COO.astype(np.int32)), pos=jnp.asarray(pos), num_nodes=N)
    for ref_fn, our_fn in ((ref_avg, P.avg_pool), (ref_max, P.max_pool)):
        r = ref_fn(t(cluster), rdata)
        o = our_fn(cluster, data)
        np.testing.assert_allclose(np.asarray(o.x), r.x.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o.pos), r.pos.numpy(),
                                   rtol=1e-5, atol=1e-6)
        assert _edge_set(np.asarray(o.edge_index)) == \
            _edge_set(r.edge_index.numpy())


def test_avg_max_pool_x():
    from torch_geometric.nn import avg_pool_x as ref_ax, max_pool_x as ref_mx
    cluster = np.sort(rng.integers(0, 5, N))
    ra, _ = ref_ax(t(cluster), t(X), t(BATCH))
    rm, _ = ref_mx(t(cluster), t(X), t(BATCH))
    np.testing.assert_allclose(
        np.asarray(P.avg_pool_x(jnp.asarray(cluster), jnp.asarray(X), 5)),
        ra.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(P.max_pool_x(jnp.asarray(cluster), jnp.asarray(X), 5)),
        rm.numpy(), rtol=1e-5, atol=1e-6)


def test_pool_neighbor_x():
    from torch_geometric.data import Data as RefData
    from torch_geometric.nn import (avg_pool_neighbor_x as ref_avg,
                                    max_pool_neighbor_x as ref_max)
    from pytorch_geometric_tpu.data import Data
    for ref_fn, our_fn in ((ref_avg, P.avg_pool_neighbor_x),
                           (ref_max, P.max_pool_neighbor_x)):
        rdata = RefData(x=t(X).clone(), edge_index=t(COO))
        data = Data(x=jnp.asarray(X), edge_index=jnp.asarray(
            COO.astype(np.int32)), num_nodes=N)
        r = ref_fn(rdata)
        o = our_fn(data)
        np.testing.assert_allclose(np.asarray(o.x), r.x.numpy(),
                                   rtol=1e-5, atol=1e-6)
