from .norms import (BatchNorm, InstanceNorm, LayerNorm, GraphNorm,
                    GraphSizeNorm, PairNorm, MeanSubtractionNorm, MsgNorm,
                    DiffGroupNorm, HeteroBatchNorm, HeteroLayerNorm)

__all__ = [
    'BatchNorm', 'InstanceNorm', 'LayerNorm', 'GraphNorm', 'GraphSizeNorm',
    'PairNorm', 'MeanSubtractionNorm', 'MsgNorm', 'DiffGroupNorm',
    'HeteroBatchNorm', 'HeteroLayerNorm',
]

MessageNorm = MsgNorm  # reference-name alias (norm/msg_norm.py)
__all__.append('MessageNorm')
