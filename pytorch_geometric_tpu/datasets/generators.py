"""Synthetic graph generators: KarateClub, StochasticBlockModel,
BA-shapes explainer benchmark, FakeHeteroDataset.

Reference: ``torch_geometric/datasets/karate.py`` (Zachary 1977 —
public-domain sociology data), ``sbm_dataset.py``,
``explainer_dataset.py`` + ``graph_generator/ba_graph.py`` +
``motif_generator/house.py``, ``datasets/fake.py:111``.
"""

from typing import Optional, Sequence, Tuple

import numpy as np

from ..data.data import Data
from ..data.hetero_data import HeteroData

# Zachary's karate club (1977), 78 undirected friendship edges among 34
# members; communities from the canonical split (public-domain data).
_KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
    (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
    (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21),
    (1, 30), (2, 3), (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28),
    (2, 32), (3, 7), (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10),
    (5, 16), (6, 16), (8, 30), (8, 32), (8, 33), (9, 33), (13, 33),
    (14, 32), (14, 33), (15, 32), (15, 33), (18, 32), (18, 33), (19, 33),
    (20, 32), (20, 33), (22, 32), (22, 33), (23, 25), (23, 27), (23, 29),
    (23, 32), (23, 33), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
    (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33), (30, 32),
    (30, 33), (31, 32), (31, 33), (32, 33),
]
_KARATE_COMMUNITY = [
    1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 1, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


class KarateClub:
    """Zachary's karate club (reference ``datasets/karate.py``)."""

    def __init__(self, transform=None):
        e = np.array(_KARATE_EDGES, np.int32).T
        coo = np.concatenate([e, e[::-1]], axis=1)
        order = np.lexsort((coo[1], coo[0]))
        coo = coo[:, order]
        y = np.array(_KARATE_COMMUNITY, np.int32)
        x = np.eye(34, dtype=np.float32)
        train_mask = np.zeros(34, bool)
        for c in (0, 1):
            train_mask[np.nonzero(y == c)[0][0]] = True
        data = Data(x=x, edge_index=coo, y=y, train_mask=train_mask,
                    num_nodes=34)
        self._data = transform(data) if transform else data

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        return self._data


class StochasticBlockModelDataset:
    """SBM generator (reference ``datasets/sbm_dataset.py``)."""

    def __init__(self, block_sizes: Sequence[int],
                 edge_probs, num_channels: int = 16, seed: int = 0,
                 transform=None):
        rng = np.random.default_rng(seed)
        sizes = np.asarray(block_sizes)
        probs = np.asarray(edge_probs)
        n = int(sizes.sum())
        y = np.repeat(np.arange(len(sizes)), sizes).astype(np.int32)
        rows, cols = [], []
        offs = np.concatenate([[0], np.cumsum(sizes)])
        for i in range(len(sizes)):
            for j in range(len(sizes)):
                block = rng.random((sizes[i], sizes[j])) < probs[i, j]
                if i == j:
                    block = np.triu(block, 1)
                r, c = np.nonzero(block)
                rows.append(r + offs[i])
                cols.append(c + offs[j])
        row = np.concatenate(rows)
        col = np.concatenate(cols)
        coo = np.stack([np.concatenate([row, col]),
                        np.concatenate([col, row])]).astype(np.int32)
        centers = rng.standard_normal((len(sizes), num_channels)) * 1.5
        x = (centers[y]
             + rng.standard_normal((n, num_channels))).astype(np.float32)
        data = Data(x=x, edge_index=coo, y=y, num_nodes=n)
        self._data = transform(data) if transform else data

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        return self._data


def ba_graph(rng, num_nodes: int, num_edges_per_node: int = 5
             ) -> np.ndarray:
    """Barabasi-Albert preferential attachment
    (reference ``datasets/graph_generator/ba_graph.py``)."""
    m = num_edges_per_node
    targets = list(range(m))
    repeated = []
    rows, cols = [], []
    for v in range(m, num_nodes):
        for t in set(targets):
            rows.append(v)
            cols.append(t)
        repeated.extend(targets)
        repeated.extend([v] * m)
        targets = [repeated[i] for i in
                   rng.integers(0, len(repeated), m)]
    e = np.stack([np.array(rows), np.array(cols)])
    return np.concatenate([e, e[::-1]], axis=1).astype(np.int32)


class ExplainerDataset:
    """BA-shapes: BA base graph + attached house motifs with ground-truth
    masks (reference ``datasets/explainer_dataset.py``)."""

    HOUSE_EDGES = np.array([(0, 1), (1, 2), (2, 3), (3, 0), (3, 4),
                            (4, 0)], np.int64).T

    def __init__(self, num_nodes: int = 300, num_motifs: int = 80,
                 seed: int = 0, transform=None):
        rng = np.random.default_rng(seed)
        base = ba_graph(rng, num_nodes)
        edges = [base]
        n = num_nodes
        node_label = np.zeros(num_nodes, np.int32)
        node_mask = np.zeros(num_nodes, bool)
        for _ in range(num_motifs):
            he = self.HOUSE_EDGES + n
            he = np.concatenate([he, he[::-1]], axis=1)
            attach = rng.integers(0, num_nodes)
            link = np.array([[attach, n], [n, attach]], np.int64).T
            edges.extend([he, link])
            node_label = np.concatenate(
                [node_label, np.array([1, 1, 2, 2, 3], np.int32)])
            node_mask = np.concatenate([node_mask, np.ones(5, bool)])
            n += 5
        coo = np.concatenate(edges, axis=1).astype(np.int32)
        x = np.ones((n, 10), np.float32)
        data = Data(x=x, edge_index=coo, y=node_label,
                    node_mask=node_mask, num_nodes=n)
        self._data = transform(data) if transform else data

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        return self._data


class FakeHeteroDataset:
    """Random heterogeneous graphs (reference ``datasets/fake.py:111``)."""

    def __init__(self, num_graphs: int = 1, num_node_types: int = 3,
                 num_edge_types: int = 6, avg_num_nodes: int = 100,
                 avg_degree: int = 10, num_channels: int = 16,
                 num_classes: int = 4, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.num_classes = num_classes
        node_types = [f'v{i}' for i in range(num_node_types)]
        edge_types = []
        for i in range(num_edge_types):
            s = node_types[rng.integers(0, num_node_types)]
            d = node_types[rng.integers(0, num_node_types)]
            edge_types.append((s, f'e{i}', d))
        self._graphs = []
        for g in range(num_graphs):
            data = HeteroData()
            sizes = {}
            for t in node_types:
                nt = max(2, int(rng.normal(avg_num_nodes,
                                           avg_num_nodes * 0.1)))
                sizes[t] = nt
                y = rng.integers(0, num_classes, nt)
                centers = rng.standard_normal((num_classes,
                                               num_channels)) * 2
                x = (centers[y] + rng.standard_normal(
                    (nt, num_channels))).astype(np.float32)
                data[t].x = x
                data[t].y = y.astype(np.int32)
            for et in edge_types:
                s, _, d = et
                e = sizes[s] * avg_degree // 2
                coo = np.stack([
                    rng.integers(0, sizes[s], e),
                    rng.integers(0, sizes[d], e)]).astype(np.int32)
                data[et].edge_index = coo
            self._graphs.append(data)

    def __len__(self):
        return len(self._graphs)

    def __getitem__(self, idx):
        return self._graphs[idx]
