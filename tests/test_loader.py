"""Sampler + loader tests (mirrors reference test/loader/, test/sampler/).

Key invariant (reference test/distributed/test_dist_neighbor_loader.py):
``n_id[edge_index] == global edge`` for every sampled edge.
"""
import numpy as np
import pytest

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.datasets import FakeDataset
from pytorch_geometric_tpu.loader import (DataLoader, NeighborLoader,
                                          LinkNeighborLoader, ClusterData,
                                          ClusterLoader, partition_graph,
                                          GraphSAINTNodeSampler,
                                          GraphSAINTRandomWalkSampler,
                                          ShaDowKHopSampler,
                                          RandomNodeLoader,
                                          ImbalancedSampler,
                                          DynamicBatchSampler)
from pytorch_geometric_tpu.sampler import (NeighborSampler,
                                           NodeSamplerInput)

rng = np.random.default_rng(0)


def make_graph(n=100, e=400, f=8, classes=4):
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    return Data(x=rng.standard_normal((n, f)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, classes, n),
                num_nodes=n)


def test_neighbor_sampler_invariants():
    data = make_graph()
    sampler = NeighborSampler(data, num_neighbors=[5, 3], seed=0)
    seeds = np.array([1, 7, 42, 13], np.int64)
    out = sampler.sample_from_nodes(NodeSamplerInput(node=seeds))
    # seeds come first
    np.testing.assert_array_equal(out.node[:4], seeds)
    assert out.batch_size == 4
    # static budgets: caps = 4 + 20 + 60 nodes, 20 + 60 edges
    assert len(out.node) == 4 + 20 + 60
    assert len(out.row) == 20 + 60
    # every valid edge maps to a real global edge
    coo = np.asarray(data.edge_index)
    gset = set(map(tuple, coo.T))
    for k in np.nonzero(out.edge_mask)[0]:
        src_g = out.node[out.row[k]]
        dst_g = out.node[out.col[k]]
        assert (src_g, dst_g) in gset
        # and the recorded global edge id matches endpoints
        eid = out.edge[k]
        assert coo[0, eid] == src_g and coo[1, eid] == dst_g
    # hop accounting sums to valid totals
    assert sum(out.num_sampled_edges) == out.edge_mask.sum()
    assert sum(out.num_sampled_nodes) == out.node_mask.sum()


def test_neighbor_sampler_budget_stability():
    data = make_graph()
    sampler = NeighborSampler(data, num_neighbors=[4, 2], seed=0)
    sampler.batch_size = 8
    shapes = set()
    for i in range(3):
        seeds = rng.integers(0, 100, 8)
        out = sampler.sample_from_nodes(NodeSamplerInput(node=seeds))
        shapes.add((len(out.node), len(out.row)))
    assert len(shapes) == 1   # one compiled program for all batches


def test_neighbor_loader():
    data = make_graph()
    loader = NeighborLoader(data, num_neighbors=[5, 3], batch_size=8,
                            shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 13  # 100/8 rounded up
    b = batches[0]
    assert b.x.shape[0] == len(np.asarray(b.n_id))
    # features joined correctly
    nm = np.asarray(b.node_mask)
    np.testing.assert_allclose(
        np.asarray(b.x)[nm],
        np.asarray(data.x)[np.asarray(b.n_id)[nm]])
    # labels of seeds usable for loss
    assert int(b.batch_size) == 8
    # shapes equal across batches (static compile)
    assert all(x.x.shape == b.x.shape for x in batches)


def test_link_neighbor_loader():
    data = make_graph()
    loader = LinkNeighborLoader(data, num_neighbors=[4],
                                neg_sampling_ratio=1.0, batch_size=16,
                                seed=0)
    b = next(iter(loader))
    eli = np.asarray(b.edge_label_index)
    lbl = np.asarray(b.edge_label)
    assert eli.shape == (2, 32)
    assert (lbl[:16] == 1).all() and (lbl[16:] == 0).all()
    # label index points into local nodes
    assert eli.max() < np.asarray(b.n_id).shape[0]


def test_partition_and_cluster():
    data = make_graph(n=120, e=600)
    parts = partition_graph(data.edge_index, 120, 4, seed=0)
    counts = np.bincount(parts, minlength=4)
    assert counts.min() > 0 and counts.max() <= 1.1 * 120 / 4 + 1
    cd = ClusterData(data, num_parts=4)
    sub = cd[0]
    assert sub.num_nodes == counts[np.argsort(-counts)].min() or \
        sub.num_nodes > 0
    # edges are internal
    coo = np.asarray(sub.edge_index)
    if coo.size:
        assert coo.max() < sub.num_nodes
    loader = ClusterLoader(cd, batch_size=2, shuffle=True, seed=0)
    got = sum(b.num_nodes for b in loader)
    assert got == 120  # every node exactly once across batches


def test_graph_saint():
    data = make_graph()
    s = GraphSAINTNodeSampler(data, batch_size=40, num_steps=3,
                              sample_coverage=2, seed=0)
    batches = list(s)
    assert len(batches) == 3
    assert batches[0].node_norm is not None
    s = GraphSAINTRandomWalkSampler(data, batch_size=10, walk_length=2,
                                    num_steps=2, seed=0)
    b = next(iter(s))
    assert b.num_nodes > 0


def test_shadow_and_random_node():
    data = make_graph()
    s = ShaDowKHopSampler(data, depth=2, num_neighbors=3,
                          node_idx=np.arange(10), batch_size=5)
    b = next(iter(s))
    assert b.num_graphs == 5
    loader = RandomNodeLoader(data, num_parts=5)
    total = sum(b.num_nodes for b in loader)
    assert total == 100


def test_dataloader_buckets():
    ds = FakeDataset(num_graphs=10, avg_num_nodes=30, avg_degree=4,
                     num_channels=8, task='graph', seed=1)
    loader = DataLoader(ds, batch_size=4, shuffle=True)
    shapes = {b.x.shape for b in loader}
    # bucketing keeps the number of distinct shapes small
    assert len(shapes) <= 3
    b = next(iter(loader))
    assert b.num_graphs == 4


def test_imbalanced_and_dynamic():
    y = np.array([0] * 90 + [1] * 10)
    s = ImbalancedSampler(y, num_samples=1000, seed=0)
    idx = np.fromiter(iter(s), np.int64)
    frac1 = (y[idx] == 1).mean()
    assert 0.4 < frac1 < 0.6

    ds = FakeDataset(num_graphs=8, avg_num_nodes=20, avg_degree=3,
                     num_channels=4, task='graph', seed=0)
    batches = list(DynamicBatchSampler(ds, max_num=50, mode='node'))
    for b in batches:
        total = sum(ds[i].num_nodes for i in b)
        assert total <= 50 or len(b) == 1


def test_native_partitioner_quality_and_balance():
    """C++ multilevel partitioner (csrc/partition.cpp): available,
    balanced, and at least as good as single-level LDG on a clustered
    graph."""
    from pytorch_geometric_tpu.csrc import load
    if load() is None:
        import pytest
        pytest.skip('native library unavailable')
    from pytorch_geometric_tpu.loader.cluster import (edge_cut,
                                                      partition_graph)
    rng = np.random.default_rng(0)
    n, e, k = 5000, 60000, 20
    blk = rng.integers(0, k, n)
    members = [np.where(blk == b)[0] for b in range(k)]
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    intra = rng.random(e) < 0.9
    for i in np.where(intra)[0]:
        m = members[blk[src[i]]]
        dst[i] = m[rng.integers(0, len(m))]
    coo = np.stack([src, dst])
    parts = partition_graph(coo, n, 8, seed=0)
    counts = np.bincount(parts, minlength=8)
    assert counts.max() <= 1.05 * n / 8 + 1
    cut_ml = edge_cut(coo, parts)
    cut_ldg = edge_cut(coo, partition_graph(coo, n, 8, seed=0,
                                            method='ldg'))
    assert cut_ml <= cut_ldg + 0.02, (cut_ml, cut_ldg)


def test_prefetch_loader_threaded():
    """Threaded prefetch: same batches, same order, host sampling on a
    producer thread; errors propagate."""
    from pytorch_geometric_tpu.loader import NeighborLoader, PrefetchLoader
    data = make_graph(n=200, e=900)
    def mk():
        return NeighborLoader(data, num_neighbors=[4, 4], batch_size=64,
                              shuffle=False, seed=0)
    plain = [np.asarray(b.n_id) for b in mk()]
    threaded = [np.asarray(b.n_id)
                for b in PrefetchLoader(mk(), num_threads=1)]
    assert len(plain) == len(threaded)
    for a, b in zip(plain, threaded):
        np.testing.assert_array_equal(a, b)

    class Boom:
        def __iter__(self):
            yield {'x': np.ones(3)}
            raise RuntimeError('sampler exploded')

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match='exploded'):
        list(PrefetchLoader(Boom(), num_threads=1))


def test_neighbor_loader_workers_deterministic():
    """num_workers>0: identical batches to serial iteration (per-batch
    seeds decouple thread scheduling from RNG state)."""
    from pytorch_geometric_tpu.loader import NeighborLoader
    data = make_graph(n=300, e=1500)

    def collect(workers):
        loader = NeighborLoader(data, num_neighbors=[5, 3],
                                batch_size=64, shuffle=True, seed=7,
                                num_workers=workers)
        return [(np.asarray(b.n_id), np.asarray(b.edge_index))
                for b in loader]

    serial = collect(0)
    threaded = collect(4)
    assert len(serial) == len(threaded)
    for (n0, e0), (n1, e1) in zip(serial, threaded):
        np.testing.assert_array_equal(n0, n1)
        np.testing.assert_array_equal(e0, e1)


def test_neighbor_loader_filter_features_false():
    """Structure-only batches: n_id-gather of device-resident features
    reproduces the host-joined x exactly."""
    from pytorch_geometric_tpu.loader import NeighborLoader
    data = make_graph(n=200, e=900)

    def mk(ff):
        return NeighborLoader(data, num_neighbors=[4, 3], batch_size=50,
                              shuffle=False, seed=3, filter_features=ff)

    X = np.asarray(data.x)
    for joined, structural in zip(mk(True), mk(False)):
        assert structural.x is None
        nid = np.asarray(structural.n_id)
        nm = np.asarray(structural.node_mask)
        gathered = X[np.where(nm, nid, 0)]
        gathered[~nm] = 0
        np.testing.assert_allclose(np.asarray(joined.x), gathered)
        np.testing.assert_array_equal(np.asarray(joined.edge_index),
                                      np.asarray(structural.edge_index))
