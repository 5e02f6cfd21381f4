"""Conversions to/from networkx and scipy (reference
``torch_geometric/utils/convert.py``)."""

from typing import Optional

import numpy as np

from ..data.data import Data


def to_scipy_sparse_matrix(edge_index,
                           edge_attr: Optional[np.ndarray] = None,
                           num_nodes: Optional[int] = None):
    """(reference ``convert.py:to_scipy_sparse_matrix``)."""
    import scipy.sparse as sp
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    n = num_nodes or (int(coo.max()) + 1 if coo.size else 0)
    w = (np.ones(coo.shape[1]) if edge_attr is None
         else np.asarray(edge_attr).reshape(-1))
    return sp.coo_matrix((w, (coo[0], coo[1])), shape=(n, n))


def from_scipy_sparse_matrix(mat):
    """(reference ``convert.py:from_scipy_sparse_matrix``)."""
    m = mat.tocoo()
    coo = np.stack([m.row, m.col]).astype(np.int64)
    return coo, m.data


def to_networkx(data: Data, node_attrs=None, edge_attrs=None,
                to_undirected: bool = False,
                remove_self_loops: bool = False):
    """(reference ``convert.py:to_networkx``)."""
    import networkx as nx
    g = nx.Graph() if to_undirected else nx.DiGraph()
    n = data.num_nodes
    g.add_nodes_from(range(n))
    coo = np.asarray(data.edge_index.coo
                     if hasattr(data.edge_index, 'coo')
                     else data.edge_index)
    ea_arrays = {k: np.asarray(data[k]) for k in (edge_attrs or [])}
    if remove_self_loops:
        keep = coo[0] != coo[1]
        coo = coo[:, keep]
        ea_arrays = {k: v[keep] for k, v in ea_arrays.items()}
    for k in (node_attrs or []):
        vals = np.asarray(data[k])
        for i in range(n):
            g.nodes[i][k] = vals[i]
    for e in range(coo.shape[1]):
        attrs = {k: v[e] for k, v in ea_arrays.items()}
        g.add_edge(int(coo[0, e]), int(coo[1, e]), **attrs)
    return g


def from_networkx(g, group_node_attrs=None) -> Data:
    """(reference ``convert.py:from_networkx``)."""
    import networkx as nx
    mapping = {v: i for i, v in enumerate(g.nodes)}
    edges = [(mapping[u], mapping[v]) for u, v in g.edges]
    if not g.is_directed():
        edges = edges + [(v, u) for u, v in edges]
    coo = (np.array(edges, np.int64).T if edges
           else np.zeros((2, 0), np.int64))
    kwargs = {}
    if group_node_attrs:
        feats = []
        for v in g.nodes:
            feats.append([g.nodes[v][k] for k in group_node_attrs])
        kwargs['x'] = np.array(feats, np.float32)
    return Data(edge_index=coo, num_nodes=g.number_of_nodes(), **kwargs)
