"""Hetero loader, to_hetero, cluster pooling, Index/HashTensor,
OnDiskDataset tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu import Index, HashTensor
from pytorch_geometric_tpu.data import (Data, SQLiteDatabase,
                                        OnDiskDataset)
from pytorch_geometric_tpu.data.hetero_data import HeteroData
from pytorch_geometric_tpu.loader import HeteroNeighborLoader
from pytorch_geometric_tpu.nn import SAGEConv, to_hetero
from pytorch_geometric_tpu.nn.pool import (graclus, avg_pool, max_pool,
                                           avg_pool_x, EdgePooling,
                                           ASAPooling, MemPooling)

rng = np.random.default_rng(0)


def make_hetero(np_=12, na=8):
    data = HeteroData()
    data['p'].x = rng.standard_normal((np_, 8)).astype(np.float32)
    data['p'].y = rng.integers(0, 3, np_).astype(np.int32)
    data['a'].x = rng.standard_normal((na, 8)).astype(np.float32)
    data['p', 'cites', 'p'].edge_index = np.stack(
        [rng.integers(0, np_, 30), rng.integers(0, np_, 30)]).astype(
            np.int32)
    data['a', 'writes', 'p'].edge_index = np.stack(
        [rng.integers(0, na, 20), rng.integers(0, np_, 20)]).astype(
            np.int32)
    return data


def test_hetero_neighbor_loader():
    data = make_hetero()
    loader = HeteroNeighborLoader(data, num_neighbors=[3, 2],
                                  input_nodes=('p', np.arange(12)),
                                  batch_size=4)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    # seeds first in the paper store
    assert int(b['p'].batch_size) == 4
    # sampled edges reference valid local nodes
    for et in (('p', 'cites', 'p'), ('a', 'writes', 'p')):
        coo = np.asarray(b[et].edge_index)
        em = np.asarray(b[et].edge_mask)
        if em.any():
            src_t, _, dst_t = et
            n_src = np.asarray(b[src_t].n_id).shape[0]
            assert coo[0][em].max() < n_src
            # global consistency: n_id[local] endpoints form real edges
            orig = np.asarray(data[et].edge_index)
            gset = set(map(tuple, orig.T))
            sid = np.asarray(b[src_t].n_id)
            did = np.asarray(b[dst_t].n_id)
            for k in np.nonzero(em)[0]:
                assert (sid[coo[0, k]], did[coo[1, k]]) in gset
    # shapes static across batches
    assert all(x['p'].x.shape == b['p'].x.shape for x in batches)


def test_to_hetero():
    data = make_hetero()
    model = to_hetero(SAGEConv(out_channels=16), data.metadata())
    params = model.init(jax.random.PRNGKey(0), data.x_dict,
                        data.edge_index_dict)
    out = model.apply(params, data.x_dict, data.edge_index_dict)
    assert out['p'].shape == (12, 16)
    # independent parameters per edge type
    flat = jax.tree_util.tree_leaves(params)
    assert len(flat) >= 4


def test_graclus_and_pool():
    n = 20
    coo = np.stack([rng.integers(0, n, 60),
                    rng.integers(0, n, 60)]).astype(np.int32)
    data = Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                edge_index=coo, pos=rng.standard_normal(
                    (n, 2)).astype(np.float32), num_nodes=n)
    cluster = graclus(coo, n)
    assert cluster.min() >= 0
    out = avg_pool(cluster, data)
    assert out.num_nodes <= n
    out2 = max_pool(cluster, data)
    assert out2.num_nodes == out.num_nodes
    xj = avg_pool_x(jnp.asarray(cluster), jnp.asarray(data.x),
                    int(cluster.max()) + 1)
    assert xj.shape[0] == int(cluster.max()) + 1


def test_edge_pooling():
    n = 10
    x = rng.standard_normal((n, 4)).astype(np.float32)
    coo = np.stack([rng.integers(0, n, 20),
                    rng.integers(0, n, 20)]).astype(np.int32)
    mod = EdgePooling(in_channels=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(coo))
    score = mod.apply(params, jnp.asarray(x), jnp.asarray(coo))
    new_x, new_coo, cluster = EdgePooling.merge(x, coo,
                                                np.asarray(score))
    assert new_x.shape[0] < n or new_x.shape[0] == n
    assert cluster.shape == (n,)


def test_asap_and_mem_pooling():
    n = 12
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    coo = jnp.asarray(np.stack([rng.integers(0, n, 30),
                                rng.integers(0, n, 30)]).astype(
                                    np.int32))
    mod = ASAPooling(in_channels=8, ratio=0.5)
    params = mod.init(jax.random.PRNGKey(0), x, coo)
    new_x, adj, batch, mask, perm, fitness = mod.apply(params, x, coo)
    assert new_x.shape == (6, 8)
    assert adj.shape == (6, 6)
    assert fitness.shape == (n,)

    mod = MemPooling(in_channels=8, out_channels=4, heads=2,
                     num_clusters=3)
    params = mod.init(jax.random.PRNGKey(0), x)
    out, s = mod.apply(params, x)
    assert out.shape == (1, 3, 4)
    kl = MemPooling.kl_loss(s)
    assert np.isfinite(float(kl))


def test_index_and_hash_tensor():
    idx = Index(jnp.asarray(np.array([0, 0, 1, 2, 2], np.int32)),
                dim_size=3, is_sorted=True)
    ptr = np.asarray(idx.get_indptr())
    np.testing.assert_array_equal(ptr, [0, 2, 3, 5])
    leaves, treedef = jax.tree_util.tree_flatten(idx)
    idx2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert idx2.dim_size == 3

    ht = HashTensor(np.array([100, 5, 77]), np.array([0, 1, 2]))
    out = np.asarray(ht[np.array([5, 77, 100, 3])])
    np.testing.assert_array_equal(out, [1, 2, 0, -1])
    assert len(ht) == 3


def test_sqlite_db_and_on_disk(tmp_path):
    db = SQLiteDatabase(str(tmp_path / 'test.sqlite'))
    d = Data(x=np.ones((3, 2), np.float32),
             edge_index=np.array([[0, 1], [1, 2]], np.int32),
             num_nodes=3)
    db.insert(0, d)
    db.multi_insert([1, 2], [d, {'plain': np.arange(4)}])
    assert len(db) == 3
    back = db.get(0)
    assert isinstance(back, Data) and back.num_nodes == 3
    np.testing.assert_allclose(np.asarray(back.x), 1)
    assert db.get(2)['plain'].sum() == 6

    class Toy(OnDiskDataset):
        @property
        def raw_file_names(self):
            return []

        def _maybe_download(self):
            pass

        def process(self):
            for i in range(4):
                self.append(Data(x=np.full((2, 2), i, np.float32),
                                 edge_index=np.zeros((2, 0), np.int32),
                                 num_nodes=2))

    ds = Toy(root=str(tmp_path / 'odd'))
    assert len(ds) == 4
    assert float(np.asarray(ds[2].x)[0, 0]) == 2.0
