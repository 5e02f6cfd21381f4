from .decorators import (onlyFullTest, onlyTPU, withPackage,
                         withNativeSampler, has_package,
                         is_full_test, is_distributed_test,
                         onlyDistributedTest, onlyOnline, onlyCUDA,
                         onlyXPU, onlyLinux, noMac, noWindows,
                         minPython, onlyGraphviz, onlyNeighborSampler,
                         withMETIS, withHashTensor, withCUDA,
                         withDevice, disableExtensions,
                         withoutExtensions, get_random_tensor_frame)
from .data import get_random_edge_index, make_random_graph
from .asserts import assert_module
from .stores import MyFeatureStore, MyGraphStore
from ..datasets.fake import FakeDataset
from ..datasets.generators import FakeHeteroDataset

__all__ = ['onlyFullTest', 'onlyTPU', 'withPackage',
           'withNativeSampler', 'has_package', 'get_random_edge_index',
           'make_random_graph',
           'is_full_test', 'is_distributed_test', 'onlyDistributedTest',
           'onlyOnline', 'onlyCUDA', 'onlyXPU', 'onlyLinux', 'noMac',
           'noWindows', 'minPython', 'onlyGraphviz',
           'onlyNeighborSampler', 'withMETIS', 'withHashTensor',
           'withCUDA', 'withDevice', 'disableExtensions',
           'withoutExtensions', 'get_random_tensor_frame',
           'assert_module', 'MyFeatureStore', 'MyGraphStore',
           'FakeDataset', 'FakeHeteroDataset']
