from .base import (BaseSampler, NodeSamplerInput, EdgeSamplerInput,
                   SamplerOutput, NumNeighbors, NegativeSampling)
from .neighbor_sampler import NeighborSampler
from .hetero import (HeteroNeighborSampler, HGTSampler,
                     HeteroSamplerOutput)

__all__ = [
    'BaseSampler', 'NodeSamplerInput', 'EdgeSamplerInput', 'SamplerOutput',
    'NumNeighbors', 'NegativeSampling', 'NeighborSampler',
    'HeteroNeighborSampler', 'HGTSampler', 'HeteroSamplerOutput',
]
