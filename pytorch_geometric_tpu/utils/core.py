"""Jit-safe graph utilities (compute path).

Covers the static-shape subset of the reference's ``torch_geometric/utils``
(degree, cumsum, one_hot, index_sort, lexsort — see ``utils/__init__.py``
exports in the reference). Everything here preserves shapes, so it can sit
inside a jitted step function.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def degree(index: jnp.ndarray, num_nodes: int, dtype=jnp.float32,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Node degrees from an endpoint vector (reference ``utils/degree.py``).
    ``mask`` drops padded edges."""
    ones = jnp.ones_like(index, dtype=dtype)
    if mask is not None:
        index = jnp.where(mask, index, num_nodes)
    return jax.ops.segment_sum(ones, index, num_nodes)


def cumsum(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Cumulative sum prepended with zero (reference ``utils/_cumsum.py``):
    output has ``shape[axis] + 1`` entries; handy for building ptr vectors."""
    out = jnp.cumsum(x, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    return jnp.pad(out, pad)


def one_hot(index: jnp.ndarray, num_classes: int,
            dtype=jnp.float32) -> jnp.ndarray:
    """One-hot encoding (reference ``utils/_one_hot.py``)."""
    return jax.nn.one_hot(index, num_classes, dtype=dtype)


def index_sort(x: jnp.ndarray, max_value: Optional[int] = None):
    """Sort an index vector, returning (sorted, perm)
    (reference ``utils/_index_sort.py:33``; pyg-lib radix sort ->
    ``jax.lax.sort`` on TPU)."""
    perm = jnp.argsort(x, stable=True)
    return x[perm], perm


def lexsort(keys, descending: bool = False):
    """Lexicographic argsort over multiple keys; last key is primary
    (reference ``utils/_lexsort.py``)."""
    if descending:
        keys = [-k for k in keys]
    return jnp.lexsort(tuple(keys))


def scatter_normalize(edge_weight: jnp.ndarray, index: jnp.ndarray,
                      num_nodes: int) -> jnp.ndarray:
    """Normalise edge weights so incoming weights of each node sum to 1."""
    s = jax.ops.segment_sum(edge_weight, index, num_nodes)
    return edge_weight / jnp.maximum(s[index], 1e-16)


def maybe_num_nodes(edge_index, num_nodes: Optional[int] = None) -> int:
    """Infer node count (reference ``utils/num_nodes.py``). Host-side only —
    forces a device sync if ``num_nodes`` is not given."""
    if num_nodes is not None:
        return num_nodes
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    return int(coo.max()) + 1 if coo.size else 0
