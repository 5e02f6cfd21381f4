"""Random test-graph helpers (reference
``torch_geometric/testing/data.py:11`` get_random_edge_index)."""

from typing import Tuple

import numpy as np


def get_random_edge_index(num_src: int, num_dst: int, num_edges: int,
                          seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack([rng.integers(0, num_src, num_edges),
                     rng.integers(0, num_dst, num_edges)]).astype(
                         np.int32)


def make_random_graph(num_nodes: int = 50, num_edges: int = 200,
                      num_features: int = 16, num_classes: int = 4,
                      seed: int = 0):
    """(x, edge_index, y) numpy triple."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((num_nodes, num_features)).astype(np.float32)
    coo = get_random_edge_index(num_nodes, num_nodes, num_edges, seed)
    y = rng.integers(0, num_classes, num_nodes)
    return x, coo, y
