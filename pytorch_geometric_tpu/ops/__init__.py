from .scatter import scatter, scatter_argmax, group_argsort
from .segment import segment, segment_logsumexp, ptr2index, index2ptr
from .softmax import softmax
from .spmm import spmm, spmm_regime, auto_dense_cap

__all__ = [
    'TypedLayout', 'RaggedLayout', 'build_typed_layout',
    'build_ragged_layout', 'typed_matmul', 'grouped_matmul',
    'scatter', 'scatter_argmax', 'group_argsort',
    'segment', 'segment_logsumexp', 'ptr2index', 'index2ptr',
    'softmax', 'spmm', 'spmm_regime', 'auto_dense_cap',
    'sddmm', 'edge_softmax', 'edge_softmax_aggregate',
    'multi_relation_softmax_aggregate', 'fused_softmax_available',
    'hetero_edge_attention', 'hetero_edge_attention_multi',
    'FlashLayout', 'build_union_flash_layout', 'build_hgt_flash_layouts',
    'sampled_op', 'sampled_add', 'sampled_sub', 'sampled_mul',
    'sampled_div',
]
from .grouped import (TypedLayout, RaggedLayout, build_typed_layout,
                      build_ragged_layout, typed_matmul,
                      grouped_matmul)
from .sddmm import (sddmm, edge_softmax, edge_softmax_aggregate,
                    multi_relation_softmax_aggregate,
                    fused_softmax_available)
from .sampled import (sampled_op, sampled_add, sampled_sub,
                      sampled_mul, sampled_div)
from .edge_attention import (hetero_edge_attention,
                             hetero_edge_attention_multi,
                             FlashLayout, build_union_flash_layout,
                             build_hgt_flash_layouts)
