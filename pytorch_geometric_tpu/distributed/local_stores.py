"""Host-local feature / graph stores for one partition.

Reference: ``torch_geometric/distributed/local_feature_store.py`` (which
answers remote lookups over RPC) and ``local_graph_store.py``. TPU
redesign: a lookup that would have been remote is either (a) a halo
feature statically replicated into this partition's dir, or (b) answered
at training time by the mesh collective — so the store is a plain
in-memory map over ``[own | halo]`` with global-id addressing.
"""

from typing import Optional

import numpy as np

from ..data.stores import (EdgeAttr, EdgeLayout, InMemoryFeatureStore,
                           InMemoryGraphStore, TensorAttr)
from .partition_io import load_partition, load_partition_books


class LocalFeatureStore(InMemoryFeatureStore):
    """Features of this partition's ``[own | halo]`` nodes, addressable
    by GLOBAL node id (reference ``local_feature_store.py:41``
    ``global_id``/``id2index`` bookkeeping)."""

    def __init__(self):
        super().__init__()
        self.partition_idx = 0
        self.num_partitions = 1
        self.node_map: Optional[np.ndarray] = None   # partition book
        self._n_id: Optional[np.ndarray] = None      # local -> global
        self._g2l: Optional[np.ndarray] = None       # global -> local
        self.num_own = 0

    @classmethod
    def from_partition(cls, root: str, pid: int) -> 'LocalFeatureStore':
        store = cls()
        meta, node_map, _ = load_partition_books(root)
        part = load_partition(root, pid)
        store.partition_idx = pid
        store.num_partitions = meta['num_parts']
        store.node_map = node_map
        n_id = part['sample_n_id']
        store._n_id = n_id
        store.num_own = int(part['sample_num_own'])
        g2l = np.full(meta['num_nodes'], -1, np.int64)
        g2l[n_id] = np.arange(n_id.shape[0])
        store._g2l = g2l
        if 'sample_x' in part:
            store.put_tensor(part['sample_x'], 'node', 'x')
        if 'sample_y' in part:
            store.put_tensor(part['sample_y'], 'node', 'y')
        return store

    # -- global-id lookup ---------------------------------------------------
    def local_index(self, global_ids: np.ndarray) -> np.ndarray:
        """Global -> local positions; -1 for ids this host cannot serve
        (not owned, not in the halo)."""
        return self._g2l[np.asarray(global_ids)]

    def get_global_tensor(self, attr_name: str,
                          global_ids: np.ndarray) -> np.ndarray:
        """The reference's ``lookup_features`` for ids this host holds
        (own + replicated halo); raises on a truly-remote id, which on
        TPU signals a partitioning bug, not an RPC to make."""
        idx = self.local_index(global_ids)
        if (idx < 0).any():
            missing = np.asarray(global_ids)[idx < 0][:5]
            raise KeyError(
                f'node ids {missing.tolist()} are neither owned by nor '
                f'in the halo of partition {self.partition_idx}; '
                f're-partition or widen the halo (num_hops)')
        return self.get_tensor('node', attr_name)[idx]

    @property
    def n_id(self) -> np.ndarray:
        """Local position -> global node id."""
        return self._n_id


class LocalGraphStore(InMemoryGraphStore):
    """This partition's dst-owned edges in LOCAL ``[own | halo]`` ids,
    plus the device-step halo arrays (reference
    ``local_graph_store.py:23`` keeps global COO + partition books)."""

    def __init__(self):
        super().__init__()
        self.partition_idx = 0
        self.num_partitions = 1
        self.meta = None
        self.node_map: Optional[np.ndarray] = None
        self.device_arrays = None   # graph.npz dict for the mesh step

    @classmethod
    def from_partition(cls, root: str, pid: int) -> 'LocalGraphStore':
        store = cls()
        meta, node_map, _ = load_partition_books(root)
        part = load_partition(root, pid)
        store.partition_idx = pid
        store.num_partitions = meta['num_parts']
        store.meta = meta
        store.node_map = node_map
        n_local = int(part['sample_n_id'].shape[0])
        store.put_edge_index(part['sample_edge_index'], edge_type=None,
                             layout='coo',
                             size=(n_local, int(part['sample_num_own'])))
        keys = ('edge_src', 'edge_dst', 'edge_mask', 'edge_weight',
                'halo_send', 'halo_send_mask', 'edge_src_halo', 'own',
                'own_mask', 'x', 'y')
        store.device_arrays = {k: part[k] for k in keys if k in part}
        return store
