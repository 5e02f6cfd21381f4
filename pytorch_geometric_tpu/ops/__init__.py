from .scatter import scatter, scatter_argmax, group_argsort
from .segment import segment, segment_logsumexp, ptr2index, index2ptr
from .softmax import softmax
from .spmm import spmm

__all__ = [
    'scatter', 'scatter_argmax', 'group_argsort',
    'segment', 'segment_logsumexp', 'ptr2index', 'index2ptr',
    'softmax', 'spmm',
]
