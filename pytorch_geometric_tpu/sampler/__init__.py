from .base import (BaseSampler, NodeSamplerInput, EdgeSamplerInput,
                   SamplerOutput, NumNeighbors, NegativeSampling)
from .neighbor_sampler import BidirectionalNeighborSampler, NeighborSampler
from .hetero import (HeteroNeighborSampler, HGTSampler,
                     HeteroSamplerOutput)

__all__ = [
    'BidirectionalNeighborSampler',
    'BaseSampler', 'NodeSamplerInput', 'EdgeSamplerInput', 'SamplerOutput',
    'NumNeighbors', 'NegativeSampling', 'NeighborSampler',
    'HeteroNeighborSampler', 'HGTSampler', 'HeteroSamplerOutput',
]
