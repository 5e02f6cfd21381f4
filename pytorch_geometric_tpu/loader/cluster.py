"""ClusterData / ClusterLoader (Cluster-GCN) + graph partitioner.

Reference: ``torch_geometric/loader/cluster.py:31,235`` — partitions via
METIS (``torch.ops.torch_sparse.partition`` / ``pyg_lib.partition.metis``,
``cluster.py:113,124``) and permutes the graph into cluster-contiguous
CSR. TPU-native replacement for METIS: a multi-pass **LDG/Fennel
streaming partitioner** (linear-time, numpy) producing balanced low-cut
parts — libmetis can be linked into the C++ extension later behind the
same interface.
"""

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..data.data import Data
from ..edge_index import EdgeIndex


def partition_graph(edge_index, num_nodes: int, num_parts: int,
                    num_passes: int = 4, seed: int = 0) -> np.ndarray:
    """Balanced edge-cut node partition (LDG-style streaming with
    refinement passes). Returns int32 [num_nodes] part assignment."""
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    # symmetrise adjacency for partitioning
    row = np.concatenate([coo[0], coo[1]])
    col = np.concatenate([coo[1], coo[0]])
    order = np.argsort(row, kind='stable')
    col_sorted = col[order]
    ptr = np.searchsorted(row[order], np.arange(num_nodes + 1))

    rng = np.random.default_rng(seed)
    parts = rng.integers(0, num_parts, num_nodes).astype(np.int32)
    cap = 1.05 * num_nodes / num_parts
    counts = np.bincount(parts, minlength=num_parts).astype(np.float64)

    for _ in range(num_passes):
        for v in rng.permutation(num_nodes):
            nbrs = col_sorted[ptr[v]:ptr[v + 1]]
            if len(nbrs) == 0:
                continue
            score = np.bincount(parts[nbrs], minlength=num_parts
                                ).astype(np.float64)
            score *= (1.0 - counts / cap)
            best = int(np.argmax(score))
            old = parts[v]
            if best != old and counts[best] < cap:
                counts[old] -= 1
                counts[best] += 1
                parts[v] = best
    return parts


@dataclass
class Partition:
    """(reference ``cluster.py:22``)."""
    partptr: np.ndarray    # [P+1] node offsets in permuted order
    node_perm: np.ndarray  # [N] permuted -> original node id
    parts: np.ndarray      # [N] original node -> part


class ClusterData:
    """Partition a graph into clusters (reference ``cluster.py:31``)."""

    def __init__(self, data: Data, num_parts: int,
                 keep_inter_cluster_edges: bool = False, seed: int = 0):
        self.data = data
        self.num_parts = num_parts
        self.keep_inter_cluster_edges = keep_inter_cluster_edges
        n = data.num_nodes
        coo = np.asarray(data.edge_index.coo
                         if isinstance(data.edge_index, EdgeIndex)
                         else data.edge_index)
        parts = partition_graph(coo, n, num_parts, seed=seed)
        node_perm = np.argsort(parts, kind='stable')
        partptr = np.searchsorted(parts[node_perm],
                                  np.arange(num_parts + 1))
        self.partition = Partition(partptr, node_perm, parts)
        self._coo = coo
        # inverse: original -> permuted position
        self._inv = np.empty(n, np.int64)
        self._inv[node_perm] = np.arange(n)

    def __len__(self):
        return self.num_parts

    def subgraph(self, part_ids: List[int]) -> Data:
        """Stitch the subgraph induced by a set of clusters
        (reference ``cluster.py:235`` ClusterLoader.__collate__)."""
        p = self.partition
        node_sets = [p.node_perm[p.partptr[i]:p.partptr[i + 1]]
                     for i in part_ids]
        nodes = np.concatenate(node_sets)
        keep_mask = np.zeros(self.data.num_nodes, bool)
        keep_mask[nodes] = True
        local = np.full(self.data.num_nodes, -1, np.int64)
        local[nodes] = np.arange(len(nodes))
        coo = self._coo
        emask = keep_mask[coo[0]] & keep_mask[coo[1]]
        eidx = np.nonzero(emask)[0]
        sub = local[coo[:, eidx]].astype(np.int32)
        kwargs = {}
        if self.data.x is not None:
            kwargs['x'] = np.asarray(self.data.x)[nodes]
        if self.data.y is not None:
            y = np.asarray(self.data.y)
            if y.shape[0] == self.data.num_nodes:
                kwargs['y'] = y[nodes]
        if self.data.edge_attr is not None:
            kwargs['edge_attr'] = np.asarray(self.data.edge_attr)[eidx]
        for k in ('train_mask', 'val_mask', 'test_mask'):
            v = self.data[k]
            if v is not None:
                kwargs[k] = np.asarray(v)[nodes]
        return Data(edge_index=sub, num_nodes=len(nodes),
                    n_id=nodes, e_id=eidx, **kwargs)

    def __getitem__(self, idx: int) -> Data:
        return self.subgraph([idx])


class ClusterLoader:
    """Random cluster combinations per batch (reference
    ``cluster.py:235``)."""

    def __init__(self, cluster_data: ClusterData, batch_size: int = 1,
                 shuffle: bool = False, seed: int = 0):
        self.cluster_data = cluster_data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        p = self.cluster_data.num_parts
        return (p + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        p = self.cluster_data.num_parts
        order = (self.rng.permutation(p) if self.shuffle
                 else np.arange(p))
        for i in range(0, p, self.batch_size):
            yield self.cluster_data.subgraph(
                [int(j) for j in order[i:i + self.batch_size]])
