"""HeteroBatch collation (reference ``test/data/test_batch.py`` hetero
cases)."""

import jax
import numpy as np
import pytest

from pytorch_geometric_tpu.data import HeteroBatch, HeteroData
from pytorch_geometric_tpu.loader import DataLoader

ET = ('author', 'writes', 'paper')


def _make(rng, n_p, n_a, e):
    d = HeteroData()
    d['paper'].x = rng.normal(size=(n_p, 8)).astype(np.float32)
    d['author'].x = rng.normal(size=(n_a, 4)).astype(np.float32)
    d[ET].edge_index = np.stack(
        [rng.integers(0, n_a, e), rng.integers(0, n_p, e)])
    d[ET].edge_attr = rng.normal(size=(e, 3)).astype(np.float32)
    return d


@pytest.fixture(scope='module')
def graphs():
    rng = np.random.default_rng(0)
    return [_make(rng, 5, 3, 7), _make(rng, 8, 2, 4), _make(rng, 6, 4, 9)]


def test_collate_offsets_and_padding(graphs):
    b = HeteroBatch.from_hetero_list(
        graphs, pad_num_nodes={'paper': 32, 'author': 16},
        pad_num_edges={ET: 32})
    assert b['paper'].x.shape == (32, 8)
    assert b['author'].x.shape == (16, 4)
    assert b.num_graphs == 3
    # batch vector assigns padded rows to the dump graph id
    bv = np.asarray(b['author'].batch)
    assert (bv[:3] == 0).all() and (bv[9:] == 3).all()
    # real edges preserved; padded edges point at padded node counts
    em = np.asarray(b[ET].edge_mask)
    assert em.sum() == 20
    coo = np.asarray(b[ET].edge_index.coo)
    assert coo[0, -1] == 16 and coo[1, -1] == 32
    # offsets: graph 1's author edges land in [3, 5)
    assert (coo[0][7:11] >= 3).all() and (coo[0][7:11] < 5).all()


def test_jit_and_roundtrip(graphs):
    b = HeteroBatch.from_hetero_list(graphs)
    val = jax.jit(lambda hb: hb['paper'].x.sum())(b)
    assert np.isfinite(float(val))
    back = b.to_hetero_list()
    assert len(back) == 3
    for orig, rec in zip(graphs, back):
        np.testing.assert_allclose(np.asarray(orig['paper'].x),
                                   np.asarray(rec['paper'].x), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(orig[ET].edge_index),
                                      np.asarray(rec[ET].edge_index))
        np.testing.assert_allclose(np.asarray(orig[ET].edge_attr),
                                   np.asarray(rec[ET].edge_attr), rtol=1e-6)


def test_budget_too_small(graphs):
    with pytest.raises(ValueError, match='budget'):
        HeteroBatch.from_hetero_list(graphs, pad_num_nodes={'paper': 4})


def test_dataloader_hetero_path(graphs):
    dl = DataLoader(graphs, batch_size=2)
    batches = list(dl)
    assert len(batches) == 2
    assert isinstance(batches[0], HeteroBatch)
    # bucketed: both batches of 2... second batch has 1 graph, smaller bucket
    assert batches[0]['paper'].x.shape[0] in (16, 32)


def test_node_mask_dict(graphs):
    b = HeteroBatch.from_hetero_list(
        graphs, pad_num_nodes={'paper': 32, 'author': 16})
    masks = b.node_mask_dict()
    assert int(masks['paper'].sum()) == 19
    assert int(masks['author'].sum()) == 9


def test_global_store_collation():
    rng = np.random.default_rng(1)
    gs = []
    for i in range(3):
        d = _make(rng, 4, 3, 5)
        d.y = np.int32(i % 2)
        gs.append(d)
    b = HeteroBatch.from_hetero_list(gs)
    np.testing.assert_array_equal(np.asarray(b.y), [0, 1, 0])
    back = b.to_hetero_list()
    assert int(back[1].y) == 1
    # pytree roundtrip keeps globals
    flat, td = jax.tree_util.tree_flatten(b)
    b2 = jax.tree_util.tree_unflatten(td, flat)
    np.testing.assert_array_equal(np.asarray(b2.y), [0, 1, 0])


def test_hetero_native_sampler_topology():
    """C++ hetero_neighbor_sample (csrc/sampler.cpp) produces valid
    relabeled subgraphs; numpy fallback agrees on budgets/shapes."""
    from pytorch_geometric_tpu.sampler.base import NodeSamplerInput
    from pytorch_geometric_tpu.sampler.hetero import HeteroNeighborSampler
    rng = np.random.default_rng(0)
    NP, NA = 500, 300
    d = HeteroData()
    d['paper'].x = np.zeros((NP, 1), np.float32)
    d['author'].x = np.zeros((NA, 1), np.float32)
    d[ET].edge_index = np.stack(
        [rng.integers(0, NA, 2000), rng.integers(0, NP, 2000)])
    s = HeteroNeighborSampler(d, [4, 3], seed=0)
    seeds = rng.integers(0, NP, 16)
    out = s.sample_from_nodes('paper', NodeSamplerInput(seeds))
    coo = np.asarray(d[ET].edge_index)
    r, c, m = out.row[ET], out.col[ET], out.edge_mask[ET]
    assert (r[m] >= 0).all() and (c[m] >= 0).all()
    gsrc = out.node['author'][r[m]]
    gdst = out.node['paper'][c[m]]
    eid = out.edge[ET][m]
    np.testing.assert_array_equal(coo[0][eid], gsrc)
    np.testing.assert_array_equal(coo[1][eid], gdst)
    # seeds occupy the first local slots of the input type
    uniq = seeds[np.sort(np.unique(seeds, return_index=True)[1])]
    np.testing.assert_array_equal(out.node['paper'][:len(uniq)], uniq)
    # numpy fallback produces the same static shapes
    import pytorch_geometric_tpu.sampler.hetero as hmod
    orig = hmod.HeteroNeighborSampler._sample_native
    try:
        hmod.HeteroNeighborSampler._sample_native = lambda *a, **k: None
        out2 = s.sample_from_nodes('paper', NodeSamplerInput(seeds))
    finally:
        hmod.HeteroNeighborSampler._sample_native = orig
    assert out2.node['paper'].shape == out.node['paper'].shape
    assert out2.row[ET].shape == out.row[ET].shape
