"""Standalone TUDataset-format reader
(reference ``torch_geometric/io/tu.py::read_tu_data``).

Returns ``(data_list, sizes)`` — a list of per-graph ``Data`` plus the
feature-size bookkeeping dict; the reference returns a collated
``(data, slices, sizes)`` tuple, which is a torch-storage detail (our
``InMemoryDataset`` collates lazily from the list)."""

import os.path as osp
from typing import Dict, List, Tuple

import numpy as np

from ..data.data import Data


def _read(folder: str, prefix: str, suffix: str, dtype=np.int64,
          optional: bool = False):
    path = osp.join(folder, f'{prefix}_{suffix}.txt')
    if not osp.exists(path):
        if optional:
            return None
        raise FileNotFoundError(path)
    return np.loadtxt(path, delimiter=',', dtype=dtype, ndmin=2)


def read_tu_data(folder: str, prefix: str
                 ) -> Tuple[List[Data], Dict[str, int]]:
    edges = _read(folder, prefix, 'A') - 1                 # 1-based
    indicator = _read(folder, prefix, 'graph_indicator')[:, 0] - 1
    graph_labels = _read(folder, prefix, 'graph_labels', optional=True)
    graph_attrs = _read(folder, prefix, 'graph_attributes',
                        dtype=np.float32, optional=True)
    node_labels = _read(folder, prefix, 'node_labels', optional=True)
    node_attrs = _read(folder, prefix, 'node_attributes',
                       dtype=np.float32, optional=True)
    edge_labels = _read(folder, prefix, 'edge_labels', optional=True)
    edge_attrs = _read(folder, prefix, 'edge_attributes',
                       dtype=np.float32, optional=True)

    sizes = {
        'num_node_labels': (0 if node_labels is None
                            else int(node_labels.max()
                                     - node_labels.min()) + 1),
        'num_node_attributes': (0 if node_attrs is None
                                else node_attrs.shape[1]),
        'num_edge_labels': (0 if edge_labels is None
                            else int(edge_labels.max()
                                     - edge_labels.min()) + 1),
        'num_edge_attributes': (0 if edge_attrs is None
                                else edge_attrs.shape[1]),
    }

    feats = []
    if node_attrs is not None:
        feats.append(node_attrs)
    if node_labels is not None:
        nl = node_labels - node_labels.min()
        feats.append(np.eye(sizes['num_node_labels'],
                            dtype=np.float32)[nl[:, 0]])
    x = np.concatenate(feats, 1) if feats else None

    efeats = []
    if edge_attrs is not None:
        efeats.append(edge_attrs)
    if edge_labels is not None:
        el = edge_labels - edge_labels.min()
        efeats.append(np.eye(sizes['num_edge_labels'],
                             dtype=np.float32)[el[:, 0]])
    edge_attr = np.concatenate(efeats, 1) if efeats else None

    num_graphs = int(indicator.max()) + 1
    node_counts = np.bincount(indicator, minlength=num_graphs)
    node_offsets = np.concatenate([[0], np.cumsum(node_counts)])
    egraph = indicator[edges[:, 0]]
    eorder = np.argsort(egraph, kind='stable')
    eptr = np.searchsorted(egraph[eorder], np.arange(num_graphs + 1))

    data_list = []
    for g in range(num_graphs):
        lo, hi = node_offsets[g], node_offsets[g + 1]
        eidx = eorder[eptr[g]:eptr[g + 1]]
        ei = (edges[eidx] - lo).T.astype(np.int64)
        kwargs = {}
        if x is not None:
            kwargs['x'] = x[lo:hi]
        if edge_attr is not None:
            kwargs['edge_attr'] = edge_attr[eidx]
        if graph_labels is not None:
            kwargs['y'] = np.asarray(
                [graph_labels[g, 0] - graph_labels.min()], np.int64)
        elif graph_attrs is not None:
            kwargs['y'] = graph_attrs[g]
        data_list.append(Data(edge_index=ei, num_nodes=int(hi - lo),
                              **kwargs))
    return data_list, sizes
