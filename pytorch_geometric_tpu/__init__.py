"""pytorch_geometric_tpu — a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
pyg-team/pytorch_geometric (reference v2.8.0): EdgeIndex sparse runtime,
Data/Batch pytree containers, a MessagePassing operator substrate whose
gather -> message -> segment-reduce chain compiles onto the TPU MXU/VPU,
host-side samplers/loaders emitting fixed-shape padded batches, and
multi-chip scaling via jax.sharding meshes with halo exchange.
"""

__version__ = '0.1.0'

from .edge_index import EdgeIndex, CSR
from .index import Index, HashTensor
from .data import Data, Batch, HeteroData, Dataset, InMemoryDataset
from .seed import seed_everything
from . import ops
from . import utils
from . import nn
from . import backend
from . import experimental
from . import typing_flags
from . import transforms
from . import datasets
from . import sampler
from . import loader
from . import parallel
from . import explain
from . import metrics
from . import profile
from . import graphgym
from . import io
from . import visualization
from . import testing
from . import contrib
from . import distributed

__all__ = [
    'EdgeIndex', 'CSR', 'Index', 'HashTensor', 'Data', 'Batch', 'HeteroData', 'Dataset',
    'InMemoryDataset', 'seed_everything',
    'ops', 'utils', 'nn', 'backend', 'experimental', 'typing_flags', 'transforms', 'datasets', 'sampler', 'loader',
    'parallel', 'distributed', 'explain', 'metrics', 'profile', 'graphgym', 'io',
    'visualization', 'testing', 'contrib', '__version__',
]
from . import checkpoint
from . import logging as pgt_logging
