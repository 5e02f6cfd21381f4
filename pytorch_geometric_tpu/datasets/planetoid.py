"""Planetoid (Cora / CiteSeer / PubMed).

Reference: ``torch_geometric/datasets/planetoid.py`` +
``torch_geometric/io/planetoid.py`` — parses the pickled
``ind.<name>.{x,tx,allx,y,ty,ally,graph,test.index}`` files. Zero-egress
environment: raw files must already be present under ``root/raw``.
"""

import os.path as osp
import pickle
import sys
from typing import Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import InMemoryDataset


def _read_pickle(path):
    with open(path, 'rb') as f:
        if sys.version_info > (3, 0):
            return pickle.load(f, encoding='latin1')
        return pickle.load(f)


def _to_dense(x):
    try:
        return np.asarray(x.todense())
    except AttributeError:
        return np.asarray(x)


def read_planetoid_data(folder: str, prefix: str) -> Data:
    """Parse the pickled ind.<prefix>.* files into a single Data
    (reference ``torch_geometric/io/planetoid.py``)."""
    parts = ['x', 'tx', 'allx', 'y', 'ty', 'ally', 'graph',
             'test.index']
    raw_file_names = [f'ind.{prefix.lower()}.{p}' for p in parts]
    d = {}
    for fn in raw_file_names:
        path = osp.join(folder, fn)
        key = fn.split('.')[-1]
        if key == 'index':
            d['test_index'] = np.array(
                [int(line) for line in open(path)])
        else:
            d[key] = _read_pickle(path)

    x = _to_dense(d['x']).astype(np.float32)
    tx = _to_dense(d['tx']).astype(np.float32)
    allx = _to_dense(d['allx']).astype(np.float32)
    y = np.asarray(d['y'])
    ty = np.asarray(d['ty'])
    ally = np.asarray(d['ally'])
    test_idx = d['test_index']
    sorted_test = np.sort(test_idx)

    if prefix.lower() == 'citeseer':
        # fill isolated test nodes missing from tx
        full = np.arange(sorted_test.min(), sorted_test.max() + 1)
        tx_full = np.zeros((len(full), tx.shape[1]), np.float32)
        ty_full = np.zeros((len(full), ty.shape[1]), ty.dtype)
        tx_full[sorted_test - sorted_test.min()] = tx[
            np.argsort(test_idx)]
        ty_full[sorted_test - sorted_test.min()] = ty[
            np.argsort(test_idx)]
        tx, ty = tx_full, ty_full
        test_pos = full
    else:
        order = np.argsort(test_idx)
        tx = tx[order]
        ty = ty[order]
        test_pos = sorted_test

    X = np.concatenate([allx, tx], 0)
    Y = np.concatenate([ally, ty], 0).argmax(-1)
    # reorder test rows into their global positions
    X[test_pos] = X[len(allx):]
    Y[test_pos] = Y[len(allx):]

    n = X.shape[0]
    graph = d['graph']
    rows, cols = [], []
    for src, nbrs in graph.items():
        for dst in nbrs:
            rows.append(src)
            cols.append(dst)
    coo = np.stack([np.array(rows), np.array(cols)]).astype(np.int32)
    # reference io/planetoid.py:139-143: remove self-loops then coalesce
    # (dedupe); the stored direction is kept — NOT symmetrized (the raw
    # graph dicts are already symmetric; pubmed/citeseer contain
    # duplicate edges and self-loops that the reference strips/dedupes).
    keep = coo[0] != coo[1]
    coo = coo[:, keep]
    from ..utils.coalesce import coalesce
    coo = coalesce(coo, num_nodes=n)

    train_mask = np.zeros(n, bool)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    train_mask[:len(y)] = True
    val_mask[len(y):len(y) + 500] = True
    test_mask[test_pos] = True

    data = Data(x=X, edge_index=coo, y=Y.astype(np.int32),
                train_mask=train_mask, val_mask=val_mask,
                test_mask=test_mask, num_nodes=n)
    return data


class Planetoid(InMemoryDataset):
    """Citation networks with the public fixed split
    (reference ``datasets/planetoid.py``)."""

    def __init__(self, root: str, name: str, split: str = 'public',
                 **kwargs):
        self.name = name.lower()
        self.split = split
        super().__init__(osp.join(root, self.name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        parts = ['x', 'tx', 'allx', 'y', 'ty', 'ally', 'graph',
                 'test.index']
        return [f'ind.{self.name}.{p}' for p in parts]

    def process(self):
        data = read_planetoid_data(self.raw_dir, self.name)
        self.save([data])
