"""Bandwidth/locality-minimising node reorderings (host-side).

The cached block-sparse adjacency (``ops/bsr_spmm.py``) streams only
nonempty 128x128 blocks through the MXU; its cost is proportional to the
number of nonempty blocks, not edges. On graphs whose natural node order
scatters neighbours (power-law web/social graphs), a locality-improving
relabel concentrates edges into far fewer blocks — the TPU analog of the
reference's METIS-permuted cluster layout (reference
``loader/cluster.py:128`` `_partition` permutes nodes cluster-contiguous
before CSR construction).

Orderings:
  * ``reverse_cuthill_mckee`` — classic degree-guided BFS bandwidth
    minimiser; best for mesh/grid-like graphs.
  * ``degree_order`` — hubs first; on power-law graphs the hub-hub
    corner becomes dense blocks that capture most edges.
  * ``cluster_order`` — group nodes with the streaming partitioner into
    ~``block``-sized parts and lay parts out contiguously; best overall
    block fill on clustered graphs.
"""

from typing import Tuple

import numpy as np

__all__ = ['reverse_cuthill_mckee', 'degree_order', 'cluster_order',
           'block_fill_stats']


def _sym_csr(coo: np.ndarray, n: int):
    """Symmetrised, deduped CSR (indptr, cols, deg) of the union graph.
    Delegates to the partitioner's builder (loader/cluster.py) after
    masking padded endpoints (>= n)."""
    from ..loader.cluster import _sym_csr as _build
    src = coo[0].astype(np.int64)
    dst = coo[1].astype(np.int64)
    valid = (src < n) & (dst < n)
    indptr, cols, _w = _build(np.stack([src[valid], dst[valid]]), n)
    return indptr, cols, np.diff(indptr)


def reverse_cuthill_mckee(coo: np.ndarray, num_nodes: int) -> np.ndarray:
    """Return ``perm`` with ``perm[new_pos] = old_id`` (RCM order).

    Degree-guided BFS from a minimum-degree node per component,
    neighbours visited in increasing-degree order, final order reversed.
    """
    n = num_nodes
    indptr, cols, deg = _sym_csr(coo, n)
    visited = np.zeros(n, bool)
    perm = np.empty(n, np.int64)
    pos = 0
    for start in np.argsort(deg, kind='stable'):
        if visited[start]:
            continue
        visited[start] = True
        queue = [int(start)]
        qi = 0
        while qi < len(queue):
            node = queue[qi]
            qi += 1
            perm[pos] = node
            pos += 1
            nbrs = cols[indptr[node]:indptr[node + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if len(nbrs):
                nbrs = nbrs[np.argsort(deg[nbrs], kind='stable')]
                visited[nbrs] = True
                queue.extend(int(x) for x in nbrs)
    return perm[::-1].copy()


def degree_order(coo: np.ndarray, num_nodes: int) -> np.ndarray:
    """Hubs-first ordering: ``perm[new_pos] = old_id`` by descending
    (symmetrised) degree."""
    _, _, deg = _sym_csr(coo, num_nodes)
    return np.argsort(-deg, kind='stable')


def cluster_order(coo: np.ndarray, num_nodes: int,
                  block: int = 128) -> np.ndarray:
    """Partition into ~``num_nodes/block`` parts with the streaming
    partitioner and lay parts out contiguously (cluster-contiguous
    relabel, reference ``loader/cluster.py:128``)."""
    from ..loader.cluster import partition_graph
    p = max(int(round(num_nodes / block)), 1)
    parts = partition_graph(coo, num_nodes, p)
    return np.argsort(parts, kind='stable')


def apply_node_permutation(data, perm: np.ndarray):
    """Relabel a Data graph by ``perm`` (``perm[new] = old``): permutes
    every node-dim attribute and rewrites edge endpoints."""
    n = data.num_nodes
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    coo = np.asarray(data.edge_index)
    # padded endpoints (== n, the batch-padding sentinel) pass through
    inv_ext = np.concatenate([inv, [n]])
    new_coo = inv_ext[np.minimum(coo, n)]
    up = {'edge_index': new_coo.astype(coo.dtype)}
    for k, v in data.items():
        if k == 'edge_index' or not hasattr(v, 'shape'):
            continue
        va = np.asarray(v)
        # shape[0] == n alone misfires when num_edges == num_nodes:
        # edge_* attributes are indexed by edge, never permuted here
        if va.ndim >= 1 and va.shape[0] == n and not k.startswith('edge_'):
            up[k] = va[perm]
    return data.replace(**up), inv


def block_fill_stats(coo: np.ndarray, num_nodes: int,
                     block: int = 128,
                     min_fill: int = 16) -> Tuple[float, float, int]:
    """(captured_edge_fraction, mean_edges_per_nonempty_block,
    num_nonempty_blocks) for the BS x BS blocking of ``coo`` — the
    profitability metric of the block-sparse SpMM."""
    src = coo[0].astype(np.int64)
    dst = coo[1].astype(np.int64)
    valid = (src < num_nodes) & (dst < num_nodes)
    src, dst = src[valid], dst[valid]
    if not len(src):
        return 0.0, 0.0, 0
    s_blocks = (num_nodes + block - 1) // block
    key = (dst // block) * s_blocks + (src // block)
    _, counts = np.unique(key, return_counts=True)
    captured = counts[counts >= min_fill].sum() / len(src)
    return float(captured), float(counts.mean()), int(len(counts))
