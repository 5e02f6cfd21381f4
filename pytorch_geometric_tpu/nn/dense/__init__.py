from .linear import Linear, HeteroLinear, HeteroDictLinear
from .dense_conv import (DenseGCNConv, DenseSAGEConv, DenseGINConv,
                         DenseGraphConv, DenseGATConv)
from .dense_pool import (dense_diff_pool, dense_mincut_pool,
                         dense_dmon_pool, DMoNPooling)

__all__ = [
    'Linear', 'HeteroLinear', 'HeteroDictLinear',
    'DenseGCNConv', 'DenseSAGEConv', 'DenseGINConv', 'DenseGraphConv',
    'DenseGATConv',
    'dense_diff_pool', 'dense_mincut_pool', 'dense_dmon_pool', 'DMoNPooling',
]
