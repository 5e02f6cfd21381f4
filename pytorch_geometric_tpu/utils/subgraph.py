"""Subgraph extraction (host-side; dynamic output shapes).

Reference: ``torch_geometric/utils/_subgraph.py`` (``subgraph``,
``k_hop_subgraph``, ``bipartite_subgraph``).
"""

from typing import List, Optional, Tuple, Union

import numpy as np


def _to_np(edge_index) -> np.ndarray:
    if hasattr(edge_index, 'coo'):
        edge_index = edge_index.coo
    return np.asarray(edge_index)


def subgraph(subset: Union[np.ndarray, List[int]], edge_index,
             edge_attr: Optional[np.ndarray] = None,
             relabel_nodes: bool = False,
             num_nodes: Optional[int] = None):
    """Edge-induced subgraph on a node subset (reference
    ``_subgraph.py:subgraph``). Returns (edge_index, edge_attr[, mapping])."""
    e = _to_np(edge_index)
    subset = np.asarray(subset)
    if num_nodes is None:
        num_nodes = max(int(e.max()) + 1 if e.size else 0,
                        int(subset.max()) + 1 if subset.dtype != bool
                        and subset.size else 0)
    if subset.dtype == bool:
        node_mask = subset
        num_nodes = len(subset)
    else:
        node_mask = np.zeros(num_nodes, bool)
        node_mask[subset] = True
    edge_mask = node_mask[e[0]] & node_mask[e[1]]
    out = e[:, edge_mask]
    if relabel_nodes:
        relabel = np.full(num_nodes, -1, np.int64)
        relabel[node_mask] = np.arange(node_mask.sum())
        out = relabel[out]
    attr = None if edge_attr is None else np.asarray(edge_attr)[edge_mask]
    return out.astype(np.int32), attr, edge_mask


def k_hop_subgraph(node_idx: Union[int, List[int], np.ndarray],
                   num_hops: int, edge_index,
                   relabel_nodes: bool = False,
                   num_nodes: Optional[int] = None,
                   flow: str = 'source_to_target'
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """BFS k-hop neighbourhood (reference ``_subgraph.py:k_hop_subgraph``).
    Returns (subset, edge_index, inv(seed positions), edge_mask)."""
    e = _to_np(edge_index)
    if num_nodes is None:
        num_nodes = int(e.max()) + 1 if e.size else 0
    if flow == 'source_to_target':
        row, col = e[0], e[1]
    else:
        row, col = e[1], e[0]
    node_idx = np.atleast_1d(np.asarray(node_idx)).astype(np.int64)

    node_mask = np.zeros(num_nodes, bool)
    subsets = [node_idx]
    frontier = node_idx
    for _ in range(num_hops):
        node_mask[frontier] = True
        edge_sel = node_mask[col]
        frontier = row[edge_sel]
        subsets.append(frontier)
    subset, inv = np.unique(np.concatenate(subsets), return_inverse=True)
    inv = inv[:node_idx.size]

    node_mask[:] = False
    node_mask[subset] = True
    edge_mask = node_mask[row] & node_mask[col]
    out = e[:, edge_mask]
    if relabel_nodes:
        relabel = np.full(num_nodes, -1, np.int64)
        relabel[subset] = np.arange(subset.size)
        out = relabel[out]
    return subset, out.astype(np.int32), inv, edge_mask


def bipartite_subgraph(subset: Tuple[np.ndarray, np.ndarray], edge_index,
                       edge_attr: Optional[np.ndarray] = None,
                       relabel_nodes: bool = False,
                       size: Optional[Tuple[int, int]] = None):
    """Bipartite variant (reference ``_subgraph.py:bipartite_subgraph``)."""
    e = _to_np(edge_index)
    src_subset, dst_subset = (np.asarray(s) for s in subset)
    if size is None:
        size = (int(e[0].max()) + 1, int(e[1].max()) + 1)

    def mask_of(s, n):
        if s.dtype == bool:
            return s
        m = np.zeros(n, bool)
        m[s] = True
        return m

    src_mask, dst_mask = mask_of(src_subset, size[0]), mask_of(dst_subset,
                                                               size[1])
    edge_mask = src_mask[e[0]] & dst_mask[e[1]]
    out = e[:, edge_mask]
    if relabel_nodes:
        r0 = np.full(size[0], -1, np.int64)
        r0[src_mask] = np.arange(src_mask.sum())
        r1 = np.full(size[1], -1, np.int64)
        r1[dst_mask] = np.arange(dst_mask.sum())
        out = np.stack([r0[out[0]], r1[out[1]]])
    attr = None if edge_attr is None else np.asarray(edge_attr)[edge_mask]
    return out.astype(np.int32), attr, edge_mask
