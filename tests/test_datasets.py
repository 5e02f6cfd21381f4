"""Dataset layer tests."""
import numpy as np
import pytest

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.data.dataset import InMemoryDataset
from pytorch_geometric_tpu.datasets import (KarateClub,
                                            StochasticBlockModelDataset,
                                            ExplainerDataset,
                                            FakeHeteroDataset, TUDataset,
                                            ba_graph)


def test_karate():
    data = KarateClub()[0]
    assert data.num_nodes == 34
    assert data.num_edges == 156
    coo = np.asarray(data.edge_index)
    fwd = set(map(tuple, coo.T))
    assert all((d, s) in fwd for s, d in coo.T)
    # one labeled node per modularity community (4 classes)
    assert np.asarray(data.train_mask).sum() == 4


def test_sbm():
    ds = StochasticBlockModelDataset(
        block_sizes=[30, 30], edge_probs=[[0.3, 0.02], [0.02, 0.3]],
        seed=0)
    data = ds[0]
    assert data.num_nodes == 60
    y = np.asarray(data.y)
    coo = np.asarray(data.edge_index)
    same = (y[coo[0]] == y[coo[1]]).mean()
    assert same > 0.7  # assortative


def test_explainer_dataset():
    ds = ExplainerDataset(num_nodes=50, num_motifs=5, seed=0)
    data = ds[0]
    assert data.num_nodes == 50 + 25
    assert np.asarray(data.node_mask).sum() == 25
    assert set(np.unique(np.asarray(data.y))) == {0, 1, 2, 3}


def test_fake_hetero():
    ds = FakeHeteroDataset(num_graphs=2, avg_num_nodes=20, seed=0)
    data = ds[0]
    assert len(data.node_types) == 3
    assert len(data.edge_types) >= 1


def test_ba_graph():
    coo = ba_graph(np.random.default_rng(0), 30, 3)
    assert coo.max() < 30
    fwd = set(map(tuple, coo.T))
    assert all((d, s) in fwd for s, d in coo.T)


def test_in_memory_roundtrip(tmp_path):
    class Toy(InMemoryDataset):
        @property
        def raw_file_names(self):
            return []

        def _maybe_download(self):
            pass

        def process(self):
            rng = np.random.default_rng(0)
            graphs = [Data(x=rng.standard_normal((5, 3)).astype(
                np.float32),
                edge_index=np.array([[0, 1], [1, 2]], np.int32),
                y=np.array([i]), num_nodes=5) for i in range(3)]
            self.save(graphs)

    ds = Toy(root=str(tmp_path / 'toy'))
    assert len(ds) == 3
    assert ds[1].x.shape == (5, 3)
    # reload from disk in a fresh instance
    ds2 = Toy(root=str(tmp_path / 'toy'))
    ds2._data_list = None
    assert len(ds2) == 3
    np.testing.assert_allclose(np.asarray(ds2[2].x),
                               np.asarray(ds[2].x))
    assert ds.num_classes == 3


def test_tu_dataset(tmp_path):
    # write a tiny MUTAG-format dataset: 2 graphs (triangle + edge)
    raw = tmp_path / 'TOY' / 'TOY' / 'raw'
    raw.mkdir(parents=True)
    (raw / 'TOY_A.txt').write_text(
        '1, 2\n2, 1\n2, 3\n3, 2\n3, 1\n1, 3\n4, 5\n5, 4\n')
    (raw / 'TOY_graph_indicator.txt').write_text('1\n1\n1\n2\n2\n')
    (raw / 'TOY_graph_labels.txt').write_text('1\n-1\n')
    (raw / 'TOY_node_labels.txt').write_text('0\n1\n0\n1\n0\n')
    ds = TUDataset(root=str(tmp_path / 'TOY'), name='TOY')
    assert len(ds) == 2
    g0, g1 = ds[0], ds[1]
    assert g0.num_nodes == 3 and g0.num_edges == 6
    assert g1.num_nodes == 2 and g1.num_edges == 2
    assert g0.x.shape == (3, 2)   # one-hot node labels
    assert int(np.asarray(g0.y)[0]) != int(np.asarray(g1.y)[0])
    coo = np.asarray(g1.edge_index)
    assert coo.max() < 2          # relabeled to local ids


def test_download_error(tmp_path):
    from pytorch_geometric_tpu.datasets import Planetoid
    with pytest.raises(RuntimeError, match='no network egress'):
        Planetoid(root=str(tmp_path), name='cora')
