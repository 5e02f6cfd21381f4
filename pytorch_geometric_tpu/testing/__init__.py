from .decorators import (onlyFullTest, onlyTPU, withPackage,
                         withNativeSampler, has_package)
from .data import get_random_edge_index, make_random_graph

__all__ = ['onlyFullTest', 'onlyTPU', 'withPackage',
           'withNativeSampler', 'has_package', 'get_random_edge_index',
           'make_random_graph']
