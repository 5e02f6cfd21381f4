from .base import (BaseSampler, NodeSamplerInput, EdgeSamplerInput,
                   SamplerOutput, NumNeighbors, NegativeSampling)
from .neighbor_sampler import NeighborSampler

__all__ = [
    'BaseSampler', 'NodeSamplerInput', 'EdgeSamplerInput', 'SamplerOutput',
    'NumNeighbors', 'NegativeSampling', 'NeighborSampler',
]
