"""IBMB — influence-based minibatching (reference
``torch_geometric/loader/ibmb_loader.py:555,702``, Gasteiger et al.).

Output nodes are grouped so that each batch's auxiliary node set (top
PPR-influence nodes) maximally covers its outputs; batches then train on
the induced subgraph.
"""

from typing import Iterator, List, Optional

import numpy as np

from ..data.data import Data
from ..edge_index import EdgeIndex


def _coo(data):
    ei = data.edge_index
    return np.asarray(ei.coo if isinstance(ei, EdgeIndex) else ei)


class IBMBNodeLoader:
    """Node-level IBMB (reference ``ibmb_loader.py:555``).

    Partitions output nodes by PPR-similarity ordering; each batch's
    node set = outputs + their top-k PPR neighbors.
    """

    def __init__(self, data: Data, batch_order: str = 'order',
                 output_indices: Optional[np.ndarray] = None,
                 num_nodes_per_batch: int = 64,
                 num_auxiliary_nodes: int = 128,
                 alpha: float = 0.2, seed: int = 0):
        self.data = data
        self.coo = _coo(data)
        n = data.num_nodes
        if output_indices is None:
            output_indices = np.arange(n)
        self.output_indices = np.asarray(output_indices)
        self.num_out = num_nodes_per_batch
        self.num_aux = num_auxiliary_nodes
        self.rng = np.random.default_rng(seed)

        from ..utils.extra import ppr
        coo_p, vals = ppr(self.coo, n, alpha=alpha, eps=1e-5)
        self._ppr = np.zeros((n, n))
        self._ppr[coo_p[0], coo_p[1]] = vals

        # order outputs by a 1-D PPR embedding so nearby outputs batch
        # together (cheap stand-in for the reference's merging pass)
        score = self._ppr[self.output_indices].sum(0)
        order = np.argsort(
            -self._ppr[self.output_indices] @ score)
        self.output_indices = self.output_indices[order]

    def __len__(self):
        return (len(self.output_indices) + self.num_out - 1) \
            // self.num_out

    def __iter__(self) -> Iterator[Data]:
        from ..loader.graph_saint import _induced
        for i in range(0, len(self.output_indices), self.num_out):
            outs = self.output_indices[i:i + self.num_out]
            influence = self._ppr[outs].sum(0)
            influence[outs] = np.inf           # outputs always included
            aux = np.argsort(-influence)[:self.num_out + self.num_aux]
            nodes = np.unique(np.concatenate([outs, aux]))
            batch = _induced(self.data, nodes, self.coo)
            local = {int(v): k for k, v in enumerate(nodes)}
            out_local = np.array([local[int(v)] for v in outs],
                                 np.int64)
            yield batch.replace(output_node_mask=np.isin(
                np.arange(len(nodes)), out_local))


class IBMBBatchLoader:
    """Batch-wise IBMB (reference ``ibmb_loader.py:555``): partitions
    seed the batches — each batch is one graph partition's output nodes
    plus the partition's top PPR-influence auxiliary nodes, expanded by
    ``batch_expand_ratio``."""

    def __init__(self, data: Data, batch_order: str = 'order',
                 num_partitions: int = 4,
                 input_nodes: Optional[np.ndarray] = None,
                 batch_expand_ratio: float = 1.0,
                 alpha: float = 0.2, seed: int = 0):
        self.data = data
        self.coo = _coo(data)
        n = data.num_nodes
        if input_nodes is None:
            input_nodes = np.arange(n)
        elif np.asarray(input_nodes).dtype == bool:
            input_nodes = np.nonzero(np.asarray(input_nodes))[0]
        self.input_nodes = np.asarray(input_nodes)
        self.batch_order = batch_order
        self.expand = batch_expand_ratio
        self.rng = np.random.default_rng(seed)

        from .cluster import partition_graph
        parts = partition_graph(self.coo, n, num_partitions, seed=seed)
        in_set = np.zeros(n, bool)
        in_set[self.input_nodes] = True
        self.part_outputs = [
            np.nonzero((parts == p) & in_set)[0]
            for p in range(num_partitions)]
        self.part_outputs = [o for o in self.part_outputs if len(o)]

        from ..utils.extra import ppr
        coo_p, vals = ppr(self.coo, n, alpha=alpha, eps=1e-5)
        self._ppr = np.zeros((n, n))
        self._ppr[coo_p[0], coo_p[1]] = vals

    def __len__(self):
        return len(self.part_outputs)

    def __iter__(self) -> Iterator[Data]:
        from ..loader.graph_saint import _induced
        order = np.arange(len(self.part_outputs))
        if self.batch_order in ('rand', 'sample'):
            order = self.rng.permutation(order)
        for p in order:
            outs = self.part_outputs[p]
            budget = max(len(outs),
                         int(round(len(outs) * self.expand)))
            influence = self._ppr[outs].sum(0)
            influence[outs] = np.inf           # outputs always included
            aux = np.argsort(-influence)[:budget]
            nodes = np.unique(np.concatenate([outs, aux]))
            batch = _induced(self.data, nodes, self.coo)
            local = {int(v): k for k, v in enumerate(nodes)}
            out_local = np.array([local[int(v)] for v in outs], np.int64)
            yield batch.replace(output_node_mask=np.isin(
                np.arange(len(nodes)), out_local))
