"""Split transforms: RandomNodeSplit, RandomLinkSplit, IndexToMask.

Reference: ``torch_geometric/transforms/random_node_split.py``,
``random_link_split.py``, ``index_to_mask.py``.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .base import BaseTransform
from ..data import Data
from ..edge_index import EdgeIndex


def _coo(data):
    ei = data.edge_index
    return np.asarray(ei.coo if isinstance(ei, EdgeIndex) else ei)


class RandomNodeSplit(BaseTransform):
    """Add train/val/test node masks (reference ``random_node_split.py``;
    split='train_rest' | 'random')."""

    def __init__(self, split: str = 'train_rest', num_val=0.1,
                 num_test=0.2, num_train_per_class: int = 20,
                 seed: Optional[int] = None):
        self.split = split
        self.num_val = num_val
        self.num_test = num_test
        self.num_train_per_class = num_train_per_class
        self.rng = np.random.default_rng(seed)

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        perm = self.rng.permutation(n)
        nv = (int(self.num_val * n) if isinstance(self.num_val, float)
              else self.num_val)
        nt = (int(self.num_test * n) if isinstance(self.num_test, float)
              else self.num_test)
        val_mask = np.zeros(n, bool)
        test_mask = np.zeros(n, bool)
        train_mask = np.zeros(n, bool)
        val_mask[perm[:nv]] = True
        test_mask[perm[nv:nv + nt]] = True
        if self.split == 'train_rest':
            train_mask[perm[nv + nt:]] = True
        else:  # per-class fixed count
            y = np.asarray(data.y)
            rest = perm[nv + nt:]
            for c in np.unique(y):
                cand = rest[y[rest] == c][:self.num_train_per_class]
                train_mask[cand] = True
        return data.replace(train_mask=jnp.asarray(train_mask),
                            val_mask=jnp.asarray(val_mask),
                            test_mask=jnp.asarray(test_mask))


class RandomLinkSplit(BaseTransform):
    """Split edges into train/val/test with negative sampling
    (reference ``random_link_split.py``). Returns (train, val, test)
    Data objects with ``edge_label`` / ``edge_label_index``."""

    def __init__(self, num_val: float = 0.1, num_test: float = 0.2,
                 is_undirected: bool = False,
                 add_negative_train_samples: bool = True,
                 neg_sampling_ratio: float = 1.0,
                 seed: Optional[int] = None):
        self.num_val = num_val
        self.num_test = num_test
        self.is_undirected = is_undirected
        self.add_negative_train_samples = add_negative_train_samples
        self.neg_sampling_ratio = neg_sampling_ratio
        self.rng = np.random.default_rng(seed)

    def _neg(self, coo, n, count):
        existing = set(coo[0].astype(np.int64) * n + coo[1])
        out = []
        while len(out) < count:
            cand = self.rng.integers(0, n, (2, count))
            for s, d in cand.T:
                if s * n + d not in existing and len(out) < count:
                    out.append((s, d))
        return np.array(out, np.int64).T.reshape(2, -1)

    def __call__(self, data: Data
                 ) -> Tuple[Data, Data, Data]:
        coo = _coo(data)
        n = data.num_nodes
        e = coo.shape[1]
        if self.is_undirected:
            keep = coo[0] <= coo[1]
            coo_u = coo[:, keep]
            e = coo_u.shape[1]
        else:
            coo_u = coo
        perm = self.rng.permutation(e)
        nv = int(self.num_val * e)
        nt = int(self.num_test * e)
        val_e = coo_u[:, perm[:nv]]
        test_e = coo_u[:, perm[nv:nv + nt]]
        train_e = coo_u[:, perm[nv + nt:]]

        def mk(msg_edges, sup_edges, with_neg):
            if self.is_undirected:
                msg = np.concatenate([msg_edges, msg_edges[::-1]], 1)
            else:
                msg = msg_edges
            pos = sup_edges
            labels = [np.ones(pos.shape[1], np.float32)]
            lab_edges = [pos]
            if with_neg:
                k = int(pos.shape[1] * self.neg_sampling_ratio)
                if k > 0:
                    neg = self._neg(coo, n, k)
                    lab_edges.append(neg)
                    labels.append(np.zeros(k, np.float32))
            return data.replace(
                edge_index=jnp.asarray(msg.astype(np.int32)),
                edge_label_index=jnp.asarray(
                    np.concatenate(lab_edges, 1).astype(np.int32)),
                edge_label=jnp.asarray(np.concatenate(labels)))

        train = mk(train_e, train_e, self.add_negative_train_samples)
        val = mk(train_e, val_e, True)
        test = mk(np.concatenate([train_e, val_e], 1), test_e, True)
        return train, val, test


class IndexToMask(BaseTransform):
    """index arrays -> bool masks (reference ``index_to_mask.py``)."""

    def __init__(self, attrs=('train_index', 'val_index', 'test_index'),
                 sizes: Optional[int] = None, replace: bool = True):
        self.attrs = attrs
        self.replace = replace

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        up = {}
        for k in self.attrs:
            v = data[k]
            if v is None:
                continue
            mask = np.zeros(n, bool)
            mask[np.asarray(v)] = True
            up[k.replace('index', 'mask')] = jnp.asarray(mask)
            if self.replace:
                up[k] = None
        return data.replace(**up)


class MaskToIndex(BaseTransform):
    """bool masks -> index arrays (reference ``mask_to_index.py``)."""

    def __init__(self, attrs=('train_mask', 'val_mask', 'test_mask'),
                 replace: bool = True):
        self.attrs = attrs
        self.replace = replace

    def __call__(self, data: Data) -> Data:
        up = {}
        for k in self.attrs:
            v = data[k]
            if v is None:
                continue
            up[k.replace('mask', 'index')] = jnp.asarray(
                np.nonzero(np.asarray(v))[0].astype(np.int32))
            if self.replace:
                up[k] = None
        return data.replace(**up)
