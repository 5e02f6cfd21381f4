"""Third parity batch: data/batching, dense utils, transforms, model
stacks, KGE scoring."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

rng = np.random.default_rng(2)
N, E, F = 16, 40, 5
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_batching_parity():
    """Disjoint-union batching offsets match the reference."""
    from torch_geometric.data import Data as TData, Batch as TBatch
    from pytorch_geometric_tpu.data import Data as JData, Batch as JBatch

    gs_t, gs_j = [], []
    for i in range(3):
        n = 4 + i
        e = 6 + i
        x = rng.standard_normal((n, F)).astype(np.float32)
        coo = np.stack([rng.integers(0, n, e),
                        rng.integers(0, n, e)]).astype(np.int64)
        gs_t.append(TData(x=t(x), edge_index=t(coo)))
        gs_j.append(JData(x=x, edge_index=coo.astype(np.int32),
                          num_nodes=n))
    bt = TBatch.from_data_list(gs_t)
    bj = JBatch.from_data_list(gs_j)
    np.testing.assert_allclose(np.asarray(bj.x), bt.x.numpy())
    np.testing.assert_array_equal(np.asarray(bj.edge_index.coo),
                                  bt.edge_index.numpy())
    np.testing.assert_array_equal(np.asarray(bj.batch),
                                  bt.batch.numpy())
    np.testing.assert_array_equal(np.asarray(bj.ptr), bt.ptr.numpy())


def test_to_dense_batch_adj_parity():
    from torch_geometric.utils import (to_dense_batch as ref_tdb,
                                       to_dense_adj as ref_tda)
    from pytorch_geometric_tpu.utils import to_dense_batch, to_dense_adj

    batch = np.sort(rng.integers(0, 3, N)).astype(np.int64)
    ref_x, ref_mask = ref_tdb(t(X), t(batch))
    L = ref_x.shape[1]
    out, mask = to_dense_batch(jnp.asarray(X),
                               jnp.asarray(batch.astype(np.int32)), 3, L)
    np.testing.assert_allclose(np.asarray(out), ref_x.numpy(),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())

    ref_adj = ref_tda(t(COO), t(batch))
    Lm = ref_adj.shape[1]
    adj = to_dense_adj(jnp.asarray(COO.astype(np.int32)),
                       jnp.asarray(batch.astype(np.int32)), 3, Lm)
    np.testing.assert_allclose(np.asarray(adj), ref_adj.numpy(),
                               rtol=1e-6)


def test_transform_parity_structural():
    import pytorch_geometric_tpu.transforms as T
    from pytorch_geometric_tpu.data import Data as JData
    from torch_geometric.data import Data as TData

    td = TData(x=t(X), edge_index=t(COO))
    jd = JData(x=X, edge_index=COO.astype(np.int32), num_nodes=N)

    # TwoHop vs a scipy oracle (the reference's torch-sparse-CSR TwoHop
    # segfaults in this CPU torch build — beta sparse op)
    import scipy.sparse as sp
    a = sp.coo_matrix((np.ones(E), (COO[0], COO[1])),
                      shape=(N, N)).tocsr()
    a2 = (a @ a).tocoo()
    expect = set(map(tuple, COO.T)) | set(zip(a2.row, a2.col))
    expect = {e for e in expect if e[0] != e[1]}
    out = T.TwoHop()(jd)
    our_set = {e for e in map(tuple, np.asarray(out.edge_index).T)
               if e[0] != e[1]}
    assert our_set == expect

    # SVDFeatureReduction
    ref = tg.transforms.SVDFeatureReduction(3)(td.clone())
    out = T.SVDFeatureReduction(3)(jd)
    np.testing.assert_allclose(np.abs(np.asarray(out.x)),
                               np.abs(ref.x.numpy()), rtol=1e-2,
                               atol=1e-3)

    # OneHotDegree
    ref = tg.transforms.OneHotDegree(8)(td.clone())
    out = T.OneHotDegree(8)(jd)
    np.testing.assert_allclose(np.asarray(out.x), ref.x.numpy())

    # LaplacianEigenvectorPE magnitudes (sign/ordering ambiguity)
    ref = tg.transforms.AddLaplacianEigenvectorPE(2)(td.clone())
    out = T.AddLaplacianEigenvectorPE(2)(jd)
    # compare column magnitudes after sorting
    a = np.sort(np.abs(ref.laplacian_eigenvector_pe.numpy()), 0)
    b = np.sort(np.abs(np.asarray(out.laplacian_eigenvector_pe)), 0)
    np.testing.assert_allclose(a, b, atol=0.3)


def test_gcn_stack_model_parity():
    """Full GCN model (reference torch_geometric.nn.models.GCN) vs ours."""
    ref = tg.nn.models.GCN(F, 12, num_layers=2, out_channels=4)
    with torch.no_grad():
        ref_out = ref(t(X), t(COO)).numpy()
    from pytorch_geometric_tpu.nn.models import GCN as JGCN
    model = JGCN(hidden_channels=12, num_layers=2, out_channels=4)
    params = {'params': {
        'conv_0': {'lin': {'kernel': jnp.asarray(
            ref.convs[0].lin.weight.detach().numpy().T)},
            'bias': jnp.asarray(ref.convs[0].bias.detach().numpy())},
        'conv_1': {'lin': {'kernel': jnp.asarray(
            ref.convs[1].lin.weight.detach().numpy().T)},
            'bias': jnp.asarray(ref.convs[1].bias.detach().numpy())},
    }}
    out = model.apply(params, jnp.asarray(X),
                      jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3,
                               atol=1e-4)


def test_kge_scoring_parity():
    """DistMult/TransE scoring formulas vs reference."""
    import pytorch_geometric_tpu.nn.kge as KGE
    h = rng.integers(0, N, 8)
    r = rng.integers(0, 3, 8)
    tl = rng.integers(0, N, 8)

    ref = tg.nn.kge.DistMult(N, 3, 6)
    with torch.no_grad():
        ref_s = ref(t(h), t(r), t(tl)).numpy()
    ours = KGE.DistMult(num_nodes=N, num_relations=3, hidden_channels=6)
    params = {'params': {
        'node_emb': jnp.asarray(ref.node_emb.weight.detach().numpy()),
        'rel_emb': jnp.asarray(ref.rel_emb.weight.detach().numpy())}}
    s = ours.apply(params, jnp.asarray(h), jnp.asarray(r),
                   jnp.asarray(tl))
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-4,
                               atol=1e-4)


def test_jk_and_mlp_parity():
    ref = tg.nn.models.JumpingKnowledge('max')
    xs_t = [t(X), t(X * 2)]
    ref_out = ref(xs_t).numpy()
    from pytorch_geometric_tpu.nn.models import JumpingKnowledge
    mod = JumpingKnowledge(mode='max')
    out = mod.apply({'params': {}}, [jnp.asarray(X),
                                     jnp.asarray(X * 2)])
    np.testing.assert_allclose(np.asarray(out), ref_out)

    ref = tg.nn.models.MLP([F, 8, 3], norm=None)
    with torch.no_grad():
        ref_out = ref(t(X)).numpy()
    from pytorch_geometric_tpu.nn.models import MLP
    mod = MLP(channel_list=[8, 3])
    params = {'params': {
        'lin_0': {'kernel': jnp.asarray(
            ref.lins[0].weight.detach().numpy().T),
            'bias': jnp.asarray(ref.lins[0].bias.detach().numpy())},
        'lin_1': {'kernel': jnp.asarray(
            ref.lins[1].weight.detach().numpy().T),
            'bias': jnp.asarray(ref.lins[1].bias.detach().numpy())},
    }}
    out = mod.apply(params, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4,
                               atol=1e-5)


def test_prefetch_and_cached_loader():
    from pytorch_geometric_tpu.loader import DataLoader
    from pytorch_geometric_tpu.loader.prefetch import (PrefetchLoader,
                                                       CachedLoader)
    from pytorch_geometric_tpu.datasets import FakeDataset
    ds = FakeDataset(num_graphs=6, avg_num_nodes=20, avg_degree=3,
                     num_channels=4, task='graph', seed=0)
    base = DataLoader(ds, batch_size=2)
    pf = PrefetchLoader(base)
    batches = list(pf)
    assert len(batches) == 3
    calls = {'n': 0}

    def tf(b):
        calls['n'] += 1
        return b

    cl = CachedLoader(base, transform=tf)
    list(cl)
    list(cl)
    assert calls['n'] == 3  # second epoch served from cache
