"""Partitioner — offline graph partitioning for multi-chip training.

Reference: ``torch_geometric/distributed/partition.py:121``
(``Partitioner.generate_partition``) writes per-partition graph stores
with a global-dst halo plus node/edge partition books. TPU redesign: the
partitioner emits **statically padded per-part arrays** (stackable to
``[P, ...]`` and shardable over a ``graph`` mesh axis) instead of
per-host pickle files; the halo is addressed by *gathered-buffer
position* (part * n_max + local_pos) so the device-side exchange needs
no hashmap.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..data.data import Data
from ..edge_index import EdgeIndex
from ..loader.cluster import partition_graph


@dataclass
class GraphPartitions:
    """Stacked, padded partitions of one graph (all arrays leading dim P).

    own:        [P, n_max]  global node id owned by part p (padded 0)
    own_mask:   [P, n_max]
    x:          [P, n_max, F] owned node features
    y:          [P, n_max]  owned labels (optional)
    edge_src:   [P, e_max]  src position in the all-gathered buffer
                            (= part(src) * n_max + local_pos(src))
    edge_dst:   [P, e_max]  dst LOCAL position (< n_max)
    edge_mask:  [P, e_max]
    edge_weight:[P, e_max]  optional per-edge weights
    node_part:  [N]         partition book (reference node_map.pt)
    global_pos: [N]         position of each global node in the gathered
                            buffer
    """
    own: np.ndarray
    own_mask: np.ndarray
    x: Optional[np.ndarray]
    y: Optional[np.ndarray]
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_mask: np.ndarray
    edge_weight: Optional[np.ndarray]
    node_part: np.ndarray
    global_pos: np.ndarray

    @property
    def num_parts(self) -> int:
        return self.own.shape[0]

    @property
    def n_max(self) -> int:
        return self.own.shape[1]


class Partitioner:
    """(reference ``distributed/partition.py:18``)."""

    def __init__(self, data: Data, num_parts: int, seed: int = 0):
        self.data = data
        self.num_parts = num_parts
        self.seed = seed

    def generate_partition(self) -> GraphPartitions:
        data = self.data
        P = self.num_parts
        n = data.num_nodes
        coo = np.asarray(data.edge_index.coo
                         if isinstance(data.edge_index, EdgeIndex)
                         else data.edge_index)
        parts = partition_graph(coo, n, P, seed=self.seed)

        local_pos = np.zeros(n, np.int64)
        counts = np.zeros(P, np.int64)
        order = np.argsort(parts, kind='stable')
        for v in order:
            p = parts[v]
            local_pos[v] = counts[p]
            counts[p] += 1
        n_max = int(counts.max())
        global_pos = parts.astype(np.int64) * n_max + local_pos

        own = np.zeros((P, n_max), np.int64)
        own_mask = np.zeros((P, n_max), bool)
        for v in range(n):
            own[parts[v], local_pos[v]] = v
            own_mask[parts[v], local_pos[v]] = True

        x = None
        if data.x is not None:
            xf = np.asarray(data.x)
            x = np.zeros((P, n_max, xf.shape[1]), xf.dtype)
            x[parts, local_pos] = xf
        y = None
        if data.y is not None:
            yf = np.asarray(data.y).reshape(-1)
            if yf.shape[0] == n:
                y = np.zeros((P, n_max), yf.dtype)
                y[parts, local_pos] = yf

        # edges assigned to the owner of their DESTINATION (CSC layout,
        # like the reference's dst-partitioned graph.pt)
        eparts = parts[coo[1]]
        e_counts = np.bincount(eparts, minlength=P)
        e_max = int(e_counts.max()) if len(e_counts) else 1
        edge_src = np.zeros((P, e_max), np.int64)
        edge_dst = np.full((P, e_max), n_max, np.int64)
        edge_mask = np.zeros((P, e_max), bool)
        ew = None
        w = data.edge_weight
        if w is not None:
            w = np.asarray(w)
            ew = np.zeros((P, e_max), w.dtype)
        cursor = np.zeros(P, np.int64)
        for e in range(coo.shape[1]):
            p = eparts[e]
            c = cursor[p]
            edge_src[p, c] = global_pos[coo[0, e]]
            edge_dst[p, c] = local_pos[coo[1, e]]
            edge_mask[p, c] = True
            if ew is not None:
                ew[p, c] = w[e]
            cursor[p] += 1

        return GraphPartitions(own=own, own_mask=own_mask, x=x, y=y,
                               edge_src=edge_src, edge_dst=edge_dst,
                               edge_mask=edge_mask, edge_weight=ew,
                               node_part=parts, global_pos=global_pos)
