"""Class-based graph/motif generator API
(reference ``datasets/graph_generator/``, ``datasets/motif_generator/``,
``datasets/explainer_dataset.py``)."""

import numpy as np

from pytorch_geometric_tpu.datasets import ExplainerDataset
from pytorch_geometric_tpu.datasets.graph_generator import (
    BAGraph, ERGraph, GraphGenerator, GridGraph, TreeGraph)
from pytorch_geometric_tpu.datasets.motif_generator import (
    CustomMotif, CycleMotif, GridMotif, HouseMotif, MotifGenerator)


def test_ba_graph():
    data = BAGraph(num_nodes=80, num_edges=3)()
    assert data.num_nodes == 80
    e = np.asarray(data.edge_index)
    assert e.shape[0] == 2 and e.max() < 80
    # undirected: every edge has its reverse
    fwd = set(map(tuple, e.T.tolist()))
    assert all((b, a) in fwd for a, b in fwd)


def test_er_graph():
    data = ERGraph(num_nodes=50, edge_prob=0.2)()
    e = np.asarray(data.edge_index)
    assert data.num_nodes == 50 and e.shape[1] > 0
    assert not np.any(e[0] == e[1])


def test_grid_graph():
    data = GridGraph(height=4, width=5)()
    assert data.pos.shape == (20, 2)


def test_tree_graph():
    data = TreeGraph(depth=3, branch=2)()
    assert data.num_nodes == 15
    e = np.asarray(data.edge_index)
    assert e.shape == (2, 14)
    depths = np.asarray(data.depth)
    # each edge goes parent(depth d) -> child(depth d+1)
    assert np.all(depths[e[1]] == depths[e[0]] + 1)
    und = TreeGraph(depth=2, branch=3, undirected=True)()
    assert np.asarray(und.edge_index).shape[1] == 2 * 12


def test_resolve():
    gen = GraphGenerator.resolve('ba', num_nodes=30, num_edges=2)
    assert isinstance(gen, BAGraph)
    motif = MotifGenerator.resolve('house')
    assert isinstance(motif, HouseMotif)


def test_house_motif():
    m = HouseMotif()()
    assert m.num_nodes == 5
    e = np.asarray(m.edge_index)
    assert e.shape == (2, 12)
    assert np.asarray(m.y).tolist() == [0, 0, 1, 1, 2]


def test_cycle_motif():
    m = CycleMotif(5)()
    e = np.asarray(m.edge_index)
    assert e.shape == (2, 10)
    # node degrees all 2 (undirected cycle)
    assert np.bincount(e[0]).tolist() == [2] * 5


def test_grid_motif():
    m = GridMotif()()
    assert m.num_nodes == 9
    assert np.asarray(m.edge_index).shape == (2, 24)


def test_custom_motif_from_data():
    from pytorch_geometric_tpu.data import Data
    d = Data(edge_index=np.array([[0, 1], [1, 0]]), num_nodes=2)
    m = CustomMotif(d)()
    assert m.num_nodes == 2


def test_explainer_dataset_generator_form():
    ds = ExplainerDataset(BAGraph(num_nodes=100, num_edges=3),
                          motif_generator='house', num_motifs=10)
    data = ds[0]
    assert data.num_nodes == 100 + 50
    nm = np.asarray(data.node_mask)
    assert nm.sum() == 50 and not nm[:100].any()
    y = np.asarray(data.y)
    assert set(y[:100].tolist()) == {0}
    assert set(y[100:].tolist()) == {1, 2, 3}
    em = np.asarray(data.edge_mask)
    e = np.asarray(data.edge_index)
    assert em.shape[0] == e.shape[1]
    # motif edges stay inside motif nodes
    assert np.all(e[:, em] >= 100)
