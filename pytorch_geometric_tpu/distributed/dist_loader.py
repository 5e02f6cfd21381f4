"""Distributed loaders: per-host batches over the local partition.

Reference: ``torch_geometric/distributed/dist_loader.py`` (worker-loop +
channel plumbing) and ``dist_neighbor_loader.py`` /
``dist_link_neighbor_loader.py``. On TPU there is no RPC channel to
drain — each host iterates its OWN seed split, samples locally (halo
statically replicated), and emits fixed-shape padded batches whose
``n_id`` are global, so a host's batch is indistinguishable from a
single-host batch downstream.
"""

from typing import Optional, Sequence

import numpy as np

from ..data.data import Data
from ..sampler import EdgeSamplerInput, NegativeSampling, NodeSamplerInput
from ..sampler.base import SamplerOutput
from .dist_context import DistContext
from .dist_neighbor_sampler import DistNeighborSampler
from .local_stores import LocalFeatureStore, LocalGraphStore


class DistLoader:
    """Common seed-batching over one partition (reference
    ``dist_loader.py:23`` minus the RPC worker loop)."""

    def __init__(self, current_ctx: Optional[DistContext] = None,
                 **kwargs):
        self.current_ctx = current_ctx
        # reference-parity knobs accepted and unused on TPU (no RPC):
        self.rpc_worker_names = {}
        for k in ('master_addr', 'master_port', 'channel',
                  'num_rpc_threads', 'rpc_timeout', 'concurrency'):
            kwargs.pop(k, None)

    def _batches(self, n: int, batch_size: int, shuffle: bool,
                 drop_last: bool, rng: np.random.Generator):
        order = rng.permutation(n) if shuffle else np.arange(n)
        for i in range(0, n, batch_size):
            idx = order[i:i + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    return
                idx = np.concatenate(
                    [idx, np.zeros(batch_size - len(idx), np.int64)])
            yield idx, min(batch_size, n - i)


class DistNeighborLoader(DistLoader):
    """(reference ``dist_neighbor_loader.py:21``). ``input_nodes`` are
    GLOBAL ids owned by this partition (default: all owned nodes)."""

    def __init__(self, feature_store: LocalFeatureStore,
                 graph_store: LocalGraphStore,
                 num_neighbors: Sequence[int],
                 input_nodes: Optional[np.ndarray] = None,
                 batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, replace: bool = False,
                 disjoint: bool = False,
                 current_ctx: Optional[DistContext] = None,
                 seed: int = 0, root: Optional[str] = None, **kwargs):
        super().__init__(current_ctx, **kwargs)
        self.feature_store = feature_store
        # root engages reference-parity cross-partition multi-hop
        # expansion (see DistNeighborSampler docstring)
        self.sampler = DistNeighborSampler(
            feature_store, graph_store, num_neighbors, replace=replace,
            disjoint=disjoint, seed=seed, batch_size=batch_size,
            root=root)
        if input_nodes is None:
            input_nodes = self.sampler.local_node_ids()
        elif np.asarray(input_nodes).dtype == bool:
            input_nodes = self.sampler.local_node_ids()[
                np.asarray(input_nodes)]
        self.input_nodes = np.asarray(input_nodes, np.int64)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.input_nodes)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        fs = self.feature_store
        for idx, real in self._batches(len(self.input_nodes),
                                       self.batch_size, self.shuffle,
                                       self.drop_last, self.rng):
            seeds = self.input_nodes[idx]
            out = self.sampler.sample_from_nodes(
                NodeSamplerInput(node=seeds, input_id=idx))
            out = SamplerOutput(**{**out.__dict__, 'batch_size': real})
            yield self._filter(out)

    def _filter(self, out: SamplerOutput) -> Data:
        """Feature join by global id: from the LOCAL store (local
        closure), or each row from its owner's dir (full expansion —
        sampled nodes may lie outside this partition's own+halo)."""
        fs = self.feature_store
        kwargs = {}
        peers = self.sampler.peers
        if peers is not None:
            safe_ids = np.where(out.node_mask, out.node, fs.n_id[0])
            try:
                x = peers.lookup('x', safe_ids).astype(np.float32,
                                                       copy=True)
                x[~out.node_mask] = 0
                kwargs['x'] = x
            except KeyError:
                pass
            try:
                y = peers.lookup('y', safe_ids).copy()
                y[~out.node_mask] = 0
                kwargs['y'] = y
            except KeyError:
                pass
            coo = np.stack([out.row, out.col]).astype(np.int32)
            new = Data(edge_index=coo, num_nodes=out.num_nodes_cap,
                       **kwargs)
            return new.replace(
                n_id=out.node, e_id=out.edge, node_mask=out.node_mask,
                edge_mask=out.edge_mask,
                batch_size=np.asarray(out.batch_size),
                num_sampled_nodes=np.asarray(out.num_sampled_nodes),
                num_sampled_edges=np.asarray(out.num_sampled_edges))
        local = np.where(out.node_mask,
                         fs.local_index(np.where(out.node_mask,
                                                 out.node, fs.n_id[0])),
                         0)
        try:
            x = fs.get_tensor('node', 'x')[local]
            x[~out.node_mask] = 0
            kwargs['x'] = x
        except KeyError:
            pass
        try:
            y_own = fs.get_tensor('node', 'y')
            # labels exist for OWNED nodes only; halo rows get 0
            safe = np.clip(local, 0, y_own.shape[0] - 1)
            y = np.where(out.node_mask & (local < y_own.shape[0]),
                         y_own[safe], 0)
            kwargs['y'] = y
        except KeyError:
            pass
        coo = np.stack([out.row, out.col]).astype(np.int32)
        new = Data(edge_index=coo, num_nodes=out.num_nodes_cap, **kwargs)
        return new.replace(
            n_id=out.node, e_id=out.edge, node_mask=out.node_mask,
            edge_mask=out.edge_mask,
            batch_size=np.asarray(out.batch_size),
            num_sampled_nodes=np.asarray(out.num_sampled_nodes),
            num_sampled_edges=np.asarray(out.num_sampled_edges))


class DistLinkNeighborLoader(DistNeighborLoader):
    """(reference ``dist_link_neighbor_loader.py:21``). Seed edges are
    this partition's dst-owned edges, in GLOBAL ids."""

    def __init__(self, feature_store: LocalFeatureStore,
                 graph_store: LocalGraphStore,
                 num_neighbors: Sequence[int],
                 edge_label_index: Optional[np.ndarray] = None,
                 edge_label: Optional[np.ndarray] = None,
                 neg_sampling_ratio: float = 0.0,
                 batch_size: int = 1, shuffle: bool = False,
                 current_ctx: Optional[DistContext] = None,
                 seed: int = 0, **kwargs):
        super().__init__(feature_store, graph_store, num_neighbors,
                         input_nodes=np.zeros(0, np.int64),
                         batch_size=batch_size, shuffle=shuffle,
                         current_ctx=current_ctx, seed=seed, **kwargs)
        fs = feature_store
        if edge_label_index is None:
            # local COO in local ids -> global
            coo = graph_store.coo(None)
            eli = np.stack([fs.n_id[coo[0]], fs.n_id[coo[1]]])
        else:
            eli = np.asarray(edge_label_index)
        self.eli_local = fs.local_index(eli.reshape(-1)).reshape(2, -1)
        if (self.eli_local < 0).any():
            raise ValueError('edge_label_index references nodes outside '
                             'this partition (+halo)')
        self.edge_label = edge_label
        self.neg = (NegativeSampling('binary', neg_sampling_ratio)
                    if neg_sampling_ratio > 0 else None)

    def __len__(self):
        return (self.eli_local.shape[1] + self.batch_size - 1) \
            // self.batch_size

    def __iter__(self):
        fs = self.feature_store
        m = self.eli_local.shape[1]
        for idx, real in self._batches(m, self.batch_size, self.shuffle,
                                       False, self.rng):
            label = (np.asarray(self.edge_label)[idx]
                     if self.edge_label is not None else None)
            out = self.sampler.sampler.sample_from_edges(
                EdgeSamplerInput(row=self.eli_local[0, idx],
                                 col=self.eli_local[1, idx],
                                 label=label, input_id=idx),
                neg_sampling=self.neg)
            node_global = fs.n_id[np.where(out.node_mask, out.node, 0)]
            node_global = np.where(out.node_mask, node_global, 0)
            out = SamplerOutput(**{**out.__dict__, 'node': node_global,
                                   'batch_size': real})
            d = self._filter(out)
            yield d.replace(
                edge_label=out.metadata['edge_label'],
                edge_label_index=out.metadata['edge_label_index'])
