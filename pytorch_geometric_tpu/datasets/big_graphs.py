"""Large single-graph benchmarks (GraphSAINT/Reddit family).

Reference: ``torch_geometric/datasets/`` — reddit.py (npz + scipy csr),
reddit2.py / flickr.py / yelp.py / amazon_products.py (GraphSAINT
layout: adj_full.npz, feats.npy, class_map.json, role.json),
nell.py (planetoid-style). Zero-egress: raw files go in ``root/raw``.
"""

import json
import os.path as osp
from typing import Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import InMemoryDataset


class Reddit(InMemoryDataset):
    """(reference ``reddit.py`` — data.npz + scipy coo adj npz)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['reddit_data.npz', 'reddit_graph.npz']

    def process(self):
        import scipy.sparse as sp
        with np.load(osp.join(self.raw_dir, 'reddit_data.npz')) as f:
            x = f['feature'].astype(np.float32)
            y = f['label'].astype(np.int32)
            split = f['node_types']
        adj = sp.load_npz(osp.join(self.raw_dir, 'reddit_graph.npz')) \
            .tocoo()
        d = Data(x=x, edge_index=np.stack([adj.row, adj.col])
                 .astype(np.int64), y=y, num_nodes=x.shape[0])
        d.train_mask = split == 1
        d.val_mask = split == 2
        d.test_mask = split == 3
        self.save([d])


class _SaintGraph(InMemoryDataset):
    """GraphSAINT raw layout (reference ``flickr.py`` etc.):
    adj_full.npz (scipy csr), feats.npy, class_map.json, role.json."""

    multilabel = False

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['adj_full.npz', 'feats.npy', 'class_map.json',
                'role.json']

    def process(self):
        import scipy.sparse as sp
        f = np.load(osp.join(self.raw_dir, 'adj_full.npz'))
        adj = sp.csr_matrix((f['data'], f['indices'], f['indptr']),
                            f['shape']).tocoo()
        x = np.load(osp.join(self.raw_dir, 'feats.npy')) \
            .astype(np.float32)
        with open(osp.join(self.raw_dir, 'class_map.json')) as fh:
            cmap = json.load(fh)
        with open(osp.join(self.raw_dir, 'role.json')) as fh:
            role = json.load(fh)
        n = x.shape[0]
        if self.multilabel:
            dim = len(next(iter(cmap.values())))
            y = np.zeros((n, dim), np.float32)
            for k, v in cmap.items():
                y[int(k)] = v
        else:
            y = np.zeros(n, np.int32)
            for k, v in cmap.items():
                y[int(k)] = v
        d = Data(x=x, edge_index=np.stack([adj.row, adj.col])
                 .astype(np.int64), y=y, num_nodes=n)
        for name in ('train', 'val', 'test'):
            mask = np.zeros(n, bool)
            mask[np.asarray(role ['tr' if name == 'train' else
                                  ('va' if name == 'val' else 'te')],
                            np.int64)] = True
            d[f'{name}_mask'] = mask
        self.save([d])


class Flickr(_SaintGraph):
    """(reference ``flickr.py``)."""


class Reddit2(_SaintGraph):
    """(reference ``reddit2.py``)."""


class Yelp(_SaintGraph):
    """(reference ``yelp.py``) — multilabel."""
    multilabel = True


class AmazonProducts(_SaintGraph):
    """(reference ``amazon_products.py``) — multilabel."""
    multilabel = True


from .planetoid import Planetoid


class NELL(Planetoid):
    """NELL knowledge graph (reference ``nell.py`` — planetoid-style
    pickles with sparse features)."""

    def __init__(self, root: str, **kwargs):
        super().__init__(root, 'nell.0.001', **kwargs)
