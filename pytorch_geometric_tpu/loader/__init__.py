from .dataloader import DataLoader, Collater
from .neighbor_loader import NeighborLoader, LinkNeighborLoader
from .cluster import ClusterData, ClusterLoader, partition_graph, Partition
from .hetero_loader import HeteroNeighborLoader, HGTLoader
from .temporal import TemporalDataLoader
from .ibmb import IBMBNodeLoader, IBMBBatchLoader
from .prefetch import PrefetchLoader, CachedLoader
from .scan_train import stack_batches, make_device_train_step
from .list_loader import ZipLoader, AffinityMixin, MultithreadingMixin, LogMemoryMixin, DataListLoader, DenseDataLoader
from .graph_saint import (GraphSAINTSampler, GraphSAINTNodeSampler,
                          GraphSAINTEdgeSampler,
                          GraphSAINTRandomWalkSampler, ShaDowKHopSampler,
                          RandomNodeLoader, ImbalancedSampler,
                          DynamicBatchSampler)

__all__ = [
    'DataLoader', 'Collater', 'NeighborLoader', 'LinkNeighborLoader',
    'HeteroNeighborLoader', 'HGTLoader', 'TemporalDataLoader',
    'IBMBNodeLoader', 'IBMBBatchLoader', 'PrefetchLoader', 'CachedLoader', 'DataListLoader',
    'stack_batches', 'make_device_train_step',
    'DenseDataLoader',
    'ClusterData', 'ClusterLoader', 'partition_graph', 'Partition',
    'GraphSAINTSampler', 'GraphSAINTNodeSampler', 'GraphSAINTEdgeSampler',
    'GraphSAINTRandomWalkSampler', 'ShaDowKHopSampler', 'RandomNodeLoader',
    'ImbalancedSampler', 'DynamicBatchSampler',
]

# reference-name aliases
from .neighbor_loader import NeighborLoader as NodeLoader  # base role
from .neighbor_loader import LinkNeighborLoader as LinkLoader
from .legacy import NeighborSampler, EdgeIndexAdj
__all__ += ['NodeLoader', 'LinkLoader', 'ZipLoader',
            'AffinityMixin', 'MultithreadingMixin', 'LogMemoryMixin',
            'NeighborSampler', 'EdgeIndexAdj']
