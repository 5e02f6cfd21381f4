"""Temporal / weighted / disjoint neighbor sampling + triplet negatives
(reference sampler/neighbor_sampler.py:428 temporal+weighted semantics,
sampler/base.py:849 triplet mode). Both the native C++ path and the
numpy fallback are exercised.
"""
import numpy as np
import pytest

import pytorch_geometric_tpu.csrc as csrc
from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.sampler import (NeighborSampler,
                                           NodeSamplerInput,
                                           EdgeSamplerInput,
                                           NegativeSampling)

rng = np.random.default_rng(0)


def make_temporal_graph(n=40, e=300):
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int64)
    return Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                edge_index=coo, num_nodes=n,
                time=np.arange(n, dtype=np.float64),          # node time
                edge_time=rng.random(e).astype(np.float64),
                edge_weight=rng.random(e).astype(np.float64))


@pytest.fixture(params=[True, False], ids=['native', 'numpy'])
def native(request, monkeypatch):
    if request.param and not csrc.WITH_NATIVE_SAMPLER:
        pytest.skip('native sampler unavailable')
    monkeypatch.setattr(csrc, 'WITH_NATIVE_SAMPLER', request.param)
    monkeypatch.setattr('pytorch_geometric_tpu.sampler.neighbor_sampler'
                        '.WITH_NATIVE_SAMPLER', request.param,
                        raising=False)
    return request.param


def test_node_time_constraint(native):
    data = make_temporal_graph()
    s = NeighborSampler(data, [5, 5], time_attr='time', seed=1)
    assert s.disjoint           # temporal forces disjoint subtrees
    seeds = np.array([10, 25, 39])
    out = s.sample_from_nodes(NodeSamplerInput(node=seeds))
    # every sampled edge's src time <= its seed's time
    for slot in np.flatnonzero(out.edge_mask):
        g_src = out.node[out.row[slot]]
        b = out.batch[out.row[slot]]
        assert data.time[g_src] <= data.time[seeds[b]]


def test_edge_time_constraint_with_seed_time(native):
    data = make_temporal_graph()
    s = NeighborSampler(data, [6], time_attr='edge_time', seed=2)
    seeds = np.array([3, 7])
    seed_time = np.array([0.5, 0.2])
    out = s.sample_from_nodes(
        NodeSamplerInput(node=seeds, time=seed_time))
    for slot in np.flatnonzero(out.edge_mask):
        b = out.batch[out.col[slot]]
        assert data.edge_time[out.edge[slot]] <= seed_time[b] + 1e-12


def test_last_strategy_most_recent(native):
    data = make_temporal_graph()
    s = NeighborSampler(data, [2], time_attr='edge_time',
                        temporal_strategy='last', seed=3)
    seeds = np.array([5])
    out = s.sample_from_nodes(
        NodeSamplerInput(node=seeds, time=np.array([1.0])))
    got = sorted(data.edge_time[out.edge[out.edge_mask]], reverse=True)
    # the ground truth: two most-recent in-edges of node 5
    coo = np.asarray(data.edge_index)
    cand = np.sort(data.edge_time[coo[1] == 5])[::-1][:2]
    np.testing.assert_allclose(got, cand[:len(got)])
    assert len(got) == min(2, (coo[1] == 5).sum())


def test_weighted_zero_weight_never_sampled(native):
    n = 10
    # star: node 0 has 6 in-edges, half weight zero
    src = np.array([1, 2, 3, 4, 5, 6])
    coo = np.stack([src, np.zeros(6, np.int64)])
    w = np.array([0., 1., 0., 1., 0., 1.])
    data = Data(edge_index=coo, num_nodes=n, w=w)
    s = NeighborSampler(data, [2], weight_attr='w', seed=4)
    hits = set()
    for _ in range(40):
        out = s.sample_from_nodes(
            NodeSamplerInput(node=np.array([0])))
        for slot in np.flatnonzero(out.edge_mask):
            hits.add(int(out.node[out.row[slot]]))
    assert hits <= {2, 4, 6}, hits
    assert len(hits) >= 2


def test_weighted_bias(native):
    n = 5
    src = np.array([1, 2, 3, 4])
    coo = np.stack([src, np.zeros(4, np.int64)])
    w = np.array([100., 1., 1., 1.])
    data = Data(edge_index=coo, num_nodes=n, w=w)
    s = NeighborSampler(data, [1], weight_attr='w', seed=5)
    counts = {g: 0 for g in src}
    for _ in range(200):
        out = s.sample_from_nodes(NodeSamplerInput(node=np.array([0])))
        for slot in np.flatnonzero(out.edge_mask):
            counts[int(out.node[out.row[slot]])] += 1
    assert counts[1] > 150, counts


def test_disjoint_batch_vector(native):
    data = make_temporal_graph()
    s = NeighborSampler(data, [3, 3], disjoint=True, seed=6)
    seeds = np.array([1, 1, 2])     # duplicate seeds stay separate
    out = s.sample_from_nodes(NodeSamplerInput(node=seeds))
    assert out.batch is not None
    assert out.num_sampled_nodes[0] == 3          # no dedup in disjoint
    np.testing.assert_array_equal(out.batch[:3], [0, 1, 2])
    # every edge connects nodes of the same subtree
    for slot in np.flatnonzero(out.edge_mask):
        assert out.batch[out.row[slot]] == out.batch[out.col[slot]]


def test_triplet_negative_sampling(native):
    data = make_temporal_graph()
    s = NeighborSampler(data, [4], seed=7)
    row = np.array([0, 1, 2])
    col = np.array([3, 4, 5])
    out = s.sample_from_edges(
        EdgeSamplerInput(row=row, col=col),
        neg_sampling=NegativeSampling(mode='triplet', amount=2.0))
    md = out.metadata
    assert set(md) == {'src_index', 'dst_pos_index', 'dst_neg_index'}
    np.testing.assert_array_equal(out.node[md['src_index']], row)
    np.testing.assert_array_equal(out.node[md['dst_pos_index']], col)
    assert len(md['dst_neg_index']) == 6
    assert (out.node[md['dst_neg_index']] < data.num_nodes).all()


def test_binary_localization_vectorized(native):
    data = make_temporal_graph()
    s = NeighborSampler(data, [4], seed=8)
    row = np.array([0, 1, 2, 0])    # duplicate src
    col = np.array([3, 4, 5, 6])
    out = s.sample_from_edges(
        EdgeSamplerInput(row=row, col=col),
        neg_sampling=NegativeSampling(mode='binary', amount=1.0))
    eli = out.metadata['edge_label_index']
    lab = out.metadata['edge_label']
    assert lab.shape[0] == eli.shape[1] == 8
    np.testing.assert_array_equal(out.node[eli[0][:4]], row)
    np.testing.assert_array_equal(out.node[eli[1][:4]], col)


def test_native_numpy_agree_on_budget_shapes():
    if not csrc.WITH_NATIVE_SAMPLER:
        pytest.skip('native sampler unavailable')
    data = make_temporal_graph()
    seeds = np.array([4, 9])
    a = NeighborSampler(data, [3, 2], time_attr='time', seed=9)
    out_a = a.sample_from_nodes(NodeSamplerInput(node=seeds))
    import pytorch_geometric_tpu.sampler.neighbor_sampler as mod
    b = NeighborSampler(data, [3, 2], time_attr='time', seed=9)
    out_b = b._sample_tw_python(seeds, len(seeds),
                                b._seed_time(
                                    NodeSamplerInput(node=seeds), seeds))
    assert out_a.node.shape == out_b.node.shape
    assert out_a.row.shape == out_b.row.shape
    # same admissible frontier sizes at hop 0 (deterministic: seeds)
    assert out_a.num_sampled_nodes[0] == out_b.num_sampled_nodes[0]
