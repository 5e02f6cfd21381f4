"""Multi-host distributed runtime.

Reference: ``torch_geometric/distributed/`` (DistContext, Partitioner
with per-partition stores + partition books, RPC-pull neighbor
sampling). TPU redesign: hosts join one ``jax.distributed`` job; the
device mesh spans processes; training-time feature exchange is the
sparse-halo ``all_to_all`` over ICI (``parallel/spmm.py``), and
sampling-time "RPC" is replaced by **static halo replication** — each
host's partition dir carries the boundary features it would otherwise
pull, so the per-batch path is fully local and the per-layer path is a
single collective.
"""

from .dist_context import DistContext, DistRole, init_process, shutdown
from .partition_io import (save_partitions, load_partition,
                           load_partition_books, load_type_books)
from .partition import Partitioner
from .local_stores import LocalFeatureStore, LocalGraphStore
from .dist_neighbor_sampler import (DistNeighborSampler,
                                    SharedRootPeers)
from .dist_loader import (DistLoader, DistNeighborLoader,
                          DistLinkNeighborLoader)
from .runtime import (global_mesh, process_local_shard,
                      make_dist_train_step)

__all__ = classes = [
    'DistContext',
    'DistRole',
    'LocalFeatureStore',
    'LocalGraphStore',
    'Partitioner',
    'DistNeighborSampler',
    'SharedRootPeers',
    'DistLoader',
    'DistNeighborLoader',
    'DistLinkNeighborLoader',
    'init_process',
    'shutdown',
    'save_partitions',
    'load_partition',
    'load_partition_books', 'load_type_books',
    'global_mesh',
    'process_local_shard',
    'make_dist_train_step',
]
