"""Synthetic dataset generators (reference ``datasets/fake.py:13,111``).

``FakeDataset`` generates random homogeneous graphs whose labels are
learnable (cluster-correlated features), so training smoke tests can
assert loss decreases / accuracy rises without any downloads.
"""

from typing import List, Optional

import numpy as np

from ..data.data import Data


class FakeDataset:
    """Random graph generator mirroring reference semantics: ``num_graphs``
    graphs with ``avg_num_nodes``/``avg_degree``, feature dim
    ``num_channels``, ``num_classes`` node (task='node') or graph
    (task='graph') labels."""

    def __init__(self, num_graphs: int = 1, avg_num_nodes: int = 1000,
                 avg_degree: int = 10, num_channels: int = 64,
                 num_classes: int = 10, task: str = 'node', seed: int = 0,
                 edge_dim: int = 0, transform=None):
        self.num_classes = num_classes
        self.task = task
        self.transform = transform
        rng = np.random.default_rng(seed)
        self._graphs: List[Data] = []
        for g in range(num_graphs):
            n = max(2, int(rng.normal(avg_num_nodes, avg_num_nodes * 0.1)))
            e = n * avg_degree
            y = rng.integers(0, num_classes, n)
            # class-correlated features -> learnable task
            centers = rng.standard_normal((num_classes, num_channels)) * 2.0
            x = centers[y] + rng.standard_normal((n, num_channels))
            # homophilous edges: half random, half intra-class
            row_r = rng.integers(0, n, e // 2)
            col_r = rng.integers(0, n, e // 2)
            perm = rng.permutation(n)
            order = np.argsort(y[perm], kind='stable')
            sorted_nodes = perm[order]
            pos = rng.integers(0, n - 1, e - e // 2)
            row_h = sorted_nodes[pos]
            col_h = sorted_nodes[np.minimum(pos + 1, n - 1)]
            edge_index = np.stack([np.concatenate([row_r, row_h]),
                                   np.concatenate([col_r, col_h])])
            kwargs = {}
            if edge_dim > 0:
                kwargs['edge_attr'] = rng.standard_normal(
                    (edge_index.shape[1], edge_dim)).astype(np.float32)
            if task == 'graph':
                data = Data(x=x.astype(np.float32),
                            edge_index=edge_index.astype(np.int32),
                            y=np.array([int(y.sum()) % num_classes]),
                            num_nodes=n, **kwargs)
            else:
                data = Data(x=x.astype(np.float32),
                            edge_index=edge_index.astype(np.int32),
                            y=y, num_nodes=n, **kwargs)
            self._graphs.append(data)

    def __len__(self) -> int:
        return len(self._graphs)

    def __getitem__(self, idx):
        if isinstance(idx, (list, np.ndarray)):
            out = FakeDataset.__new__(FakeDataset)
            out.num_classes = self.num_classes
            out.task = self.task
            out.transform = self.transform
            out._graphs = [self._graphs[i] for i in idx]
            return out
        d = self._graphs[idx]
        return d if self.transform is None else self.transform(d)

    def __iter__(self):
        return (self[i] for i in range(len(self)))


def planetoid_like(num_nodes: int = 2708, num_edges: int = 10556,
                   num_features: int = 1433, num_classes: int = 7,
                   train_per_class: int = 20, num_val: int = 500,
                   num_test: int = 1000, seed: int = 0) -> Data:
    """A Cora-shaped synthetic citation graph with Planetoid-style
    train/val/test masks — stands in for Planetoid when offline
    (reference ``datasets/planetoid.py`` split semantics)."""
    ds = FakeDataset(1, avg_num_nodes=num_nodes, avg_degree=max(
        1, num_edges // num_nodes), num_channels=num_features,
        num_classes=num_classes, seed=seed)
    data = ds[0]
    n = data.num_nodes
    y = np.asarray(data.y)
    rng = np.random.default_rng(seed)
    train_mask = np.zeros(n, bool)
    for c in range(num_classes):
        idx = np.where(y == c)[0]
        pick = rng.choice(idx, min(train_per_class, len(idx)), replace=False)
        train_mask[pick] = True
    rest = np.where(~train_mask)[0]
    rng.shuffle(rest)
    val_mask = np.zeros(n, bool)
    val_mask[rest[:num_val]] = True
    test_mask = np.zeros(n, bool)
    test_mask[rest[num_val:num_val + num_test]] = True
    return data.replace(train_mask=train_mask, val_mask=val_mask,
                        test_mask=test_mask)
