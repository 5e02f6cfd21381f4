from .message_passing import MessagePassing
from . import conv
from . import aggr
from . import norm
from . import pool
from . import dense
from . import models
from . import kge
from . import attention
from . import functional
from .conv import (GCNConv, cache_gcn_norm, gcn_norm, SAGEConv, GINConv, GINEConv, GATConv,
                   GATv2Conv, GraphConv, ResGatedGraphConv, GatedGraphConv,
                   LEConv, MFConv, FAConv, AGNNConv, ClusterGCNConv,
                   WLConvContinuous, LGConv, ChebConv, ARMAConv, SGConv,
                   SSGConv, TAGConv, APPNP, MixHopConv, TransformerConv,
                   RGCNConv, FastRGCNConv, GENConv, FiLMConv, PDNConv,
                   GeneralConv, PNAConv, EGConv, SignedConv, DirGNNConv,
                   AntiSymmetricConv, HypergraphConv, WLConv, PointNetConv,
                   EdgeConv, DynamicEdgeConv, PPFConv,
                   PointTransformerConv, GravNetConv, HeteroConv, HGTConv,
                   HANConv, GPSConv, RGATConv, SuperGATConv, HEATConv,
                   GMMConv, SplineConv, NNConv, CGConv, FeaStConv,
                   DNAConv, PANConv, XConv)
from .unpool import knn_interpolate
from .encoding import PositionalEncoding, TemporalEncoding
from .sequential import Sequential, Reshape, DataParallel
from .to_hetero import to_hetero_with_bases, to_fixed_size, to_hetero, ToHetero
from .resolver import (activation_resolver, aggregation_resolver,
                       normalization_resolver, optimizer_resolver,
                       lr_scheduler_resolver)
from .summary import summary
from .model_hub import PyGModelHubMixin
from .pool import (global_add_pool, global_mean_pool, global_max_pool,
                   TopKPooling, SAGPooling, knn, knn_graph, radius,
                   radius_graph, fps, nearest, voxel_grid)

__all__ = [
    'MessagePassing', 'conv', 'aggr', 'norm', 'pool', 'dense',
    'models', 'kge', 'attention',
    'GPSConv', 'RGATConv', 'SuperGATConv', 'HEATConv', 'GMMConv',
    'SplineConv', 'NNConv', 'CGConv', 'FeaStConv', 'DNAConv', 'PANConv', 'XConv',
    'knn_interpolate',
    'PositionalEncoding', 'TemporalEncoding', 'Sequential', 'Reshape',
    'DataParallel', 'to_hetero', 'to_hetero_with_bases', 'to_fixed_size',
    'ToHetero', 'activation_resolver', 'aggregation_resolver',
    'normalization_resolver', 'optimizer_resolver',
    'lr_scheduler_resolver', 'summary', 'PyGModelHubMixin',
    'HeteroConv', 'HGTConv', 'HANConv',
    'GCNConv', 'gcn_norm', 'cache_gcn_norm', 'SAGEConv', 'GINConv', 'GINEConv', 'GATConv',
    'GATv2Conv', 'GraphConv', 'ResGatedGraphConv', 'GatedGraphConv',
    'LEConv', 'MFConv', 'FAConv', 'AGNNConv', 'ClusterGCNConv',
    'WLConvContinuous', 'LGConv', 'ChebConv', 'ARMAConv', 'SGConv',
    'SSGConv', 'TAGConv', 'APPNP', 'MixHopConv', 'TransformerConv',
    'RGCNConv', 'FastRGCNConv', 'GENConv', 'FiLMConv', 'PDNConv',
    'GeneralConv', 'PNAConv', 'EGConv', 'SignedConv', 'DirGNNConv',
    'AntiSymmetricConv', 'HypergraphConv', 'WLConv', 'PointNetConv',
    'EdgeConv', 'DynamicEdgeConv', 'PPFConv', 'PointTransformerConv',
    'GravNetConv',
    'global_add_pool', 'global_mean_pool', 'global_max_pool',
    'TopKPooling', 'SAGPooling', 'knn', 'knn_graph', 'radius',
    'radius_graph', 'fps', 'nearest', 'voxel_grid',
]

# The reference re-exports pool/norm/dense/aggr members at
# torch_geometric.nn top level (reference nn/__init__.py:15-16) —
# mirror that so user imports port unchanged.
from .pool import *          # noqa: F401,F403
from .norm import *          # noqa: F401,F403
from .dense import *         # noqa: F401,F403
from .aggr import *          # noqa: F401,F403
from . import pool as _pool, norm as _norm, dense as _dense, aggr as _aggr
for _m in (_pool, _norm, _dense, _aggr):
    for _n in _m.__all__:
        if _n not in __all__:
            __all__.append(_n)
del _m, _n, _pool, _norm, _dense, _aggr
