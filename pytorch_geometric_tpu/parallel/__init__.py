from .partition import Partitioner, GraphPartitions
from .spmm import (partition_gat_attention,
                   partition_spmm, partition_spmm_halo,
                   partition_spmm_hub,
                   partition_spmm_ring, build_ring_buckets,
                   make_partition_gcn_step)
from .models import (gcn_norm_weights, init_gcn_params,
                     partition_gcn_apply, shard_partitions,
                     train_partition_parallel)

__all__ = [
    'Partitioner', 'GraphPartitions', 'partition_spmm',
    'partition_spmm_halo', 'partition_spmm_hub', 'partition_spmm_ring', 'build_ring_buckets',
    'partition_gat_attention',
    'make_partition_gcn_step', 'gcn_norm_weights', 'init_gcn_params',
    'partition_gcn_apply', 'shard_partitions',
    'train_partition_parallel',
]
from .mesh2d import make_mesh2d, train_2d
__all__ += ['make_mesh2d', 'train_2d']
