from .base import Aggregation
from .basic import (SumAggregation, MeanAggregation, MaxAggregation,
                    MinAggregation, MulAggregation, VarAggregation,
                    StdAggregation, SoftmaxAggregation,
                    PowerMeanAggregation, VariancePreservingAggregation)
from .multi import (MultiAggregation, DegreeScalerAggregation,
                    aggregation_resolver)
from .attention import AttentionalAggregation, Set2Set, DeepSetsAggregation
from .dense import (SortAggregation, QuantileAggregation, MedianAggregation,
                    GRUAggregation, LSTMAggregation, MLPAggregation)
from .advanced import (SetTransformerAggregation,
                       GraphMultisetTransformer, LCMAggregation,
                       PatchTransformerAggregation,
                       EquilibriumAggregation)

__all__ = [
    'Aggregation', 'aggregation_resolver',
    'SumAggregation', 'MeanAggregation', 'MaxAggregation', 'MinAggregation',
    'MulAggregation', 'VarAggregation', 'StdAggregation',
    'SoftmaxAggregation', 'PowerMeanAggregation',
    'VariancePreservingAggregation',
    'MultiAggregation', 'DegreeScalerAggregation',
    'AttentionalAggregation', 'Set2Set', 'DeepSetsAggregation',
    'SortAggregation', 'QuantileAggregation', 'MedianAggregation',
    'GRUAggregation', 'LSTMAggregation', 'MLPAggregation',
    'SetTransformerAggregation', 'GraphMultisetTransformer',
    'LCMAggregation', 'PatchTransformerAggregation',
    'EquilibriumAggregation',
]
