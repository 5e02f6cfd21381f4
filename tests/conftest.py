import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Set before importing jax.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax
# The axon TPU plugin's sitecustomize forces jax_platforms='axon,cpu' at
# interpreter start, overriding the env var — override it back so tests
# really run on the virtual 8-device CPU mesh.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_random_graph(num_nodes=50, num_edges=200, num_features=16,
                      seed=0, num_classes=4):
    """Tiny random graph for unit tests (equivalent of the reference's
    testing/data.py get_random_edge_index)."""
    rng = np.random.default_rng(seed)
    row = rng.integers(0, num_nodes, num_edges)
    col = rng.integers(0, num_nodes, num_edges)
    x = rng.standard_normal((num_nodes, num_features)).astype(np.float32)
    y = rng.integers(0, num_classes, num_nodes)
    return x, np.stack([row, col]).astype(np.int32), y
