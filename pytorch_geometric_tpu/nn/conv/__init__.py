from ..message_passing import MessagePassing
from .gcn_conv import GCNConv, cache_gcn_norm, gcn_norm
from .sage_conv import SAGEConv
from .gin_conv import GINConv, GINEConv
from .gat_conv import GATConv, GATv2Conv, FusedGATConv, CuGraphGATConv
from .graph_conv import (GraphConv, ResGatedGraphConv, GatedGraphConv,
                         LEConv, MFConv, FAConv, AGNNConv, ClusterGCNConv,
                         WLConvContinuous, LGConv)
from .spectral_conv import (ChebConv, ARMAConv, SGConv, SSGConv, TAGConv,
                            APPNP, MixHopConv)
from .transformer_conv import TransformerConv
from .rgcn_conv import RGCNConv, FastRGCNConv
from .gen_conv import (GENConv, FiLMConv, PDNConv, GeneralConv, PNAConv,
                       EGConv)
from .misc_conv import (SignedConv, DirGNNConv, AntiSymmetricConv,
                        HypergraphConv, WLConv, MeshCNNConv, SimpleConv,
                        GCN2Conv, PointGNNConv)
from .point_conv import (PointNetConv, EdgeConv, DynamicEdgeConv, PPFConv,
                         PointTransformerConv, GravNetConv)
from .hetero_conv import HeteroConv, HGTConv, HANConv
from .gps_conv import GPSConv, RGATConv, SuperGATConv, HEATConv
from .kernel_conv import GMMConv, SplineConv, NNConv, CGConv, FeaStConv
from .dna_conv import DNAConv, PANConv
from .x_conv import XConv

__all__ = [
    'MessagePassing', 'GCNConv', 'gcn_norm', 'cache_gcn_norm',
    'SAGEConv', 'GINConv',
    'GINEConv', 'GATConv', 'GATv2Conv', 'FusedGATConv',
    'GraphConv', 'ResGatedGraphConv', 'GatedGraphConv', 'LEConv', 'MFConv',
    'FAConv', 'AGNNConv', 'ClusterGCNConv', 'WLConvContinuous', 'LGConv',
    'ChebConv', 'ARMAConv', 'SGConv', 'SSGConv', 'TAGConv', 'APPNP',
    'MixHopConv', 'TransformerConv', 'RGCNConv', 'FastRGCNConv',
    'GENConv', 'FiLMConv', 'PDNConv', 'GeneralConv', 'PNAConv', 'EGConv',
    'SignedConv', 'DirGNNConv', 'AntiSymmetricConv', 'HypergraphConv',
    'WLConv', 'MeshCNNConv', 'SimpleConv', 'GCN2Conv', 'PointGNNConv', 'PointNetConv', 'EdgeConv', 'DynamicEdgeConv', 'PPFConv',
    'PointTransformerConv', 'GravNetConv', 'HeteroConv', 'HGTConv', 'HANConv',
    'GPSConv', 'RGATConv', 'SuperGATConv', 'HEATConv',
    'GMMConv', 'SplineConv', 'NNConv', 'CGConv', 'FeaStConv',
    'DNAConv', 'PANConv', 'XConv',
]

# cugraph aliases (CUDA wrappers in the reference; Pallas path here)
from .rgcn_conv import RGCNConv as CuGraphRGCNConv
from .sage_conv import SAGEConv as CuGraphSAGEConv
__all__ += ['CuGraphGATConv', 'CuGraphRGCNConv', 'CuGraphSAGEConv']
