"""Per-host neighbor sampling over the local partition.

Reference: ``torch_geometric/distributed/dist_neighbor_sampler.py`` —
per hop, look up each frontier node's owner, issue async RPCs, merge
the returned neighborhoods (``merge_sampler_outputs``). TPU redesign:
the partition dir statically replicates the 1-hop halo (srcs of local
edges), so every owned seed's ENTIRE dst-owned neighborhood — local
and remote srcs alike — is sampleable without leaving the host. Hops
beyond the first recurse only through owned destinations, matching the
reference's dst-partitioned expansion; no event loop, no RPC, no merge.
"""

from typing import Optional, Sequence

import numpy as np

from ..data.data import Data
from ..sampler import (NeighborSampler, NodeSamplerInput, SamplerOutput)
from .local_stores import LocalFeatureStore, LocalGraphStore


class DistNeighborSampler:
    """(reference ``dist_neighbor_sampler.py:63``). Samples in LOCAL
    ids, then translates outputs to GLOBAL ids via the partition's
    ``n_id`` map so downstream feature joins are host-agnostic."""

    def __init__(self, feature_store: LocalFeatureStore,
                 graph_store: LocalGraphStore,
                 num_neighbors: Sequence[int],
                 replace: bool = False, disjoint: bool = False,
                 temporal_strategy: str = 'uniform',
                 time_attr: Optional[str] = None,
                 seed: int = 0, batch_size: int = 1):
        self.feature_store = feature_store
        self.graph_store = graph_store
        self.num_neighbors = list(num_neighbors)
        edge_index = graph_store.coo(None)
        n_local = int(feature_store.n_id.shape[0])
        kwargs = {}
        try:
            kwargs['x'] = feature_store.get_tensor('node', 'x')
        except KeyError:
            pass
        data = Data(edge_index=np.asarray(edge_index),
                    num_nodes=n_local, **kwargs)
        if time_attr is not None:
            data = data.replace(
                **{time_attr: feature_store.get_tensor('node', time_attr)})
        self._local_data = data
        self.sampler = NeighborSampler(
            data, self.num_neighbors, replace=replace, disjoint=disjoint,
            temporal_strategy=temporal_strategy, time_attr=time_attr,
            seed=seed)
        self.sampler.batch_size = batch_size

    @property
    def local_data(self) -> Data:
        return self._local_data

    def sample_from_nodes(self, inputs: NodeSamplerInput) -> SamplerOutput:
        """``inputs.node`` are GLOBAL ids owned by this partition."""
        fs = self.feature_store
        local_seeds = fs.local_index(inputs.node)
        if (local_seeds < 0).any() or \
                (local_seeds >= fs.num_own).any():
            bad = np.asarray(inputs.node)[
                (local_seeds < 0) | (local_seeds >= fs.num_own)][:5]
            raise ValueError(
                f'seeds {bad.tolist()} are not owned by partition '
                f'{fs.partition_idx} (use input_nodes=local_node_ids())')
        out = self.sampler.sample_from_nodes(
            NodeSamplerInput(node=local_seeds, input_id=inputs.input_id,
                             time=inputs.time))
        # translate local node positions back to global ids; edge ids
        # stay partition-local (edge features live in this dir only)
        node_global = fs.n_id[np.where(out.node_mask, out.node, 0)]
        node_global = np.where(out.node_mask, node_global, 0)
        return SamplerOutput(**{**out.__dict__, 'node': node_global})

    def local_node_ids(self) -> np.ndarray:
        """Global ids of the nodes this partition owns — the per-host
        ``input_nodes`` split (reference ``dist_loader.py`` feeds each
        worker only its partition's train ids)."""
        return self.feature_store.n_id[:self.feature_store.num_own]
