from .base import BaseTransform, Compose
from .structure import (ReorderNodes,
                        ToUndirected, AddSelfLoops, RemoveSelfLoops,
                        RemoveDuplicatedEdges, RemoveIsolatedNodes, TwoHop,
                        VirtualNode, LineGraph, GCNNorm, SIGN, FaceToEdge,
                        ToSparseTensor, Pad)
from .features import (NormalizeFeatures, SVDFeatureReduction, Constant,
                       OneHotDegree, TargetIndegree, LocalDegreeProfile,
                       AddLaplacianEigenvectorPE, AddRandomWalkPE,
                       FeaturePropagation)
from .geometric import (Center, NormalizeScale, KNNGraph, RadiusGraph,
                        Distance, Cartesian, Polar, Spherical, RandomJitter,
                        RandomFlip, RandomRotate, RandomScale, RandomShear,
                        SamplePoints, GridSampling)
from .splits import (RandomNodeSplit, RandomLinkSplit, IndexToMask,
                     MaskToIndex)
from .diffusion import GDC, AddMetaPaths, RootedEgoNets, HalfHop
# AddGPSE lives beside its GPSE model (reference transforms/add_gpse.py)
from ..nn.models.gpse import AddGPSE

from .misc import (ComposeFilters, AddRemainingSelfLoops, Delaunay,
                   FixedPoints, GenerateMeshNormals, LaplacianLambdaMax,
                   LargestConnectedComponents, LinearTransformation,
                   LocalCartesian, NodePropertySplit, NormalizeRotation,
                   PointPairFeatures, RemoveTrainingClasses,
                   RootedRWSubgraph, ToDense, ToDevice,
                   AddRandomMetaPaths, ToSLIC)

__all__ = [
    'ComposeFilters', 'AddRemainingSelfLoops', 'Delaunay', 'FixedPoints',
    'GenerateMeshNormals', 'LaplacianLambdaMax',
    'LargestConnectedComponents', 'LinearTransformation',
    'LocalCartesian', 'NodePropertySplit', 'NormalizeRotation',
    'PointPairFeatures', 'RemoveTrainingClasses', 'RootedRWSubgraph',
    'ToDense', 'ToDevice', 'AddRandomMetaPaths', 'ToSLIC',
    'BaseTransform', 'Compose',
    'ToUndirected', 'AddSelfLoops', 'RemoveSelfLoops',
    'RemoveDuplicatedEdges', 'RemoveIsolatedNodes', 'TwoHop', 'VirtualNode',
    'AddGPSE',
    'LineGraph', 'GCNNorm', 'SIGN', 'FaceToEdge', 'ToSparseTensor', 'Pad',
    'NormalizeFeatures', 'SVDFeatureReduction', 'Constant', 'OneHotDegree',
    'TargetIndegree', 'LocalDegreeProfile', 'AddLaplacianEigenvectorPE',
    'AddRandomWalkPE', 'FeaturePropagation',
    'Center', 'NormalizeScale', 'KNNGraph', 'RadiusGraph', 'Distance',
    'Cartesian', 'Polar', 'Spherical', 'RandomJitter', 'RandomFlip',
    'RandomRotate', 'RandomScale', 'RandomShear', 'SamplePoints',
    'GridSampling',
    'RandomNodeSplit', 'RandomLinkSplit', 'IndexToMask', 'MaskToIndex',
    'GDC', 'AddMetaPaths', 'RootedEgoNets', 'HalfHop', 'ReorderNodes',
]
