"""Offline partitioner entry point for multi-host jobs.

Reference: ``torch_geometric/distributed/partition.py:18`` (Partitioner
writing per-partition stores + partition books under ``root``). Builds
on :class:`parallel.partition.Partitioner` (stacked padded arrays +
sparse halo sets) and persists them via :mod:`partition_io`.
"""

from typing import Optional, Union

import numpy as np

from ..data.data import Data
from ..data.hetero_data import HeteroData
from ..parallel.partition import GraphPartitions
from ..parallel.partition import Partitioner as _ArrayPartitioner
from .partition_io import save_partitions


class Partitioner:
    """Partition ``data`` into ``num_parts`` and write per-host dirs.

    Usage (reference ``examples/distributed/pyg/partition_graph.py``):

        Partitioner(data, num_parts=4, root='out/').generate_partition()

    Each host then calls ``load_partition(root, rank)`` and never touches
    another host's shard.
    """

    def __init__(self, data: Union[Data, HeteroData], num_parts: int,
                 root: str, recursive: bool = False, seed: int = 0):
        self.data = data
        self.num_parts = num_parts
        self.root = root
        self.recursive = recursive  # accepted for API parity (METIS knob)
        self.seed = seed

    def generate_partition(self) -> GraphPartitions:
        data, hetero_meta = self.data, None
        if isinstance(data, HeteroData):
            # reference hetero path (partition.py:179): flatten via
            # to_homogeneous with per-type offsets, partition the
            # union graph, keep type books so loaders reconstruct types
            hdata = data
            data = hdata.to_homogeneous()
            hetero_meta = {
                'node_types': list(hdata.node_types),
                'edge_types': [list(et) for et in hdata.edge_types],
                'node_type': np.asarray(data.node_type),
                'edge_type': np.asarray(data.edge_type),
            }
        parts = _ArrayPartitioner(data, self.num_parts,
                                  seed=self.seed).generate_partition()
        x = np.asarray(data.x) if data.x is not None else None
        y = None
        if data.y is not None:
            yf = np.asarray(data.y).reshape(-1)
            if yf.shape[0] == data.num_nodes:
                y = yf
        save_partitions(parts, self.root, x=x, y=y,
                        hetero_meta=hetero_meta)
        return parts
