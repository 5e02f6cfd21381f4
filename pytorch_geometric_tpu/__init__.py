"""pytorch_geometric_tpu — a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
pyg-team/pytorch_geometric (reference v2.8.0): EdgeIndex sparse runtime,
Data/Batch pytree containers, a MessagePassing operator substrate whose
gather -> message -> segment-reduce chain compiles onto the TPU MXU/VPU,
host-side samplers/loaders emitting fixed-shape padded batches, and
multi-chip scaling via jax.sharding meshes with halo exchange.
"""

__version__ = '0.1.0'

import os as _os

import jax as _jax

# PyTorch-parity numerics: torch runs true-f32 matmuls by default, while
# JAX's DEFAULT precision drops f32 dots to bf16-class accumulation
# (measured 1.4e-2 absolute error on a 416-dim Dense on CPU). Default to
# exact f32 for user model layers; the hot SpMM kernels pass their own
# per-op precision (ops/spmm.py, ops/pallas_spmm.py), which always wins
# over this global. Opt out with PGT_MATMUL_PRECISION=default|high or
# JAX_DEFAULT_MATMUL_PRECISION.
if 'JAX_DEFAULT_MATMUL_PRECISION' not in _os.environ:
    _jax.config.update(
        'jax_default_matmul_precision',
        _os.environ.get('PGT_MATMUL_PRECISION', 'highest'))

from .edge_index import EdgeIndex, CSR
from .index import Index, HashTensor
from .data import Data, Batch, HeteroData, Dataset, InMemoryDataset
from .seed import seed_everything
from .home import get_home_dir, set_home_dir
from .device import device, is_mps_available, is_xpu_available
from .compat import (compile, is_compiling, is_torch_instance,
                     is_in_onnx_export, safe_onnx_export)
from .experimental import (debug, is_debug_enabled, set_debug,
                           experimental_mode,
                           is_experimental_mode_enabled,
                           set_experimental_mode)
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
from .deprecation import LazyLoader, deprecated  # noqa: F401
from . import export  # noqa: F401
from . import distributed

__all__ = [
    'EdgeIndex', 'CSR', 'Index', 'HashTensor', 'Data', 'Batch', 'HeteroData', 'Dataset',
    'InMemoryDataset', 'seed_everything',
    'get_home_dir', 'set_home_dir', 'device', 'is_mps_available',
    'is_xpu_available', 'compile', 'is_compiling', 'is_torch_instance',
    'is_in_onnx_export', 'safe_onnx_export', 'debug', 'is_debug_enabled',
    'set_debug', 'experimental_mode', 'is_experimental_mode_enabled',
    'set_experimental_mode',
    'ops', 'utils', 'nn', 'backend', 'experimental', 'typing_flags', 'transforms', 'datasets', 'sampler', 'loader',
    'parallel', 'distributed', 'explain', 'metrics', 'profile', 'graphgym', 'io',
    'visualization', 'testing', 'contrib', '__version__',
    'LazyLoader', 'deprecated', 'export',
]
from . import checkpoint
from . import logging as pgt_logging
