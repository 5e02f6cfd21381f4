"""Self-loop utilities (reference ``torch_geometric/utils/loop.py``).

``add_self_loops`` grows E by a *static* N, so it is jit-safe.
``remove_self_loops`` would shrink E dynamically; inside jit use
``mask_self_loops`` (redirects loops to the padding row) instead.
"""

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from ..edge_index import EdgeIndex
from .core import maybe_num_nodes


def _unwrap(edge_index):
    if isinstance(edge_index, EdgeIndex):
        return edge_index.coo, edge_index.sparse_size
    return jnp.asarray(edge_index), None


def add_self_loops(
    edge_index, edge_weight: Optional[jnp.ndarray] = None,
    fill_value: Union[float, str] = 1.0,
    num_nodes: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Append (i, i) for every node (reference ``loop.py:203``,
    ``add_self_loops``). Output has E + N edges — static shape."""
    coo, size = _unwrap(edge_index)
    n = maybe_num_nodes(coo if size is None else None,
                        num_nodes if num_nodes is not None
                        else (size[0] if size else None))
    loops = jnp.arange(n, dtype=coo.dtype)
    out = jnp.concatenate([coo, jnp.stack([loops, loops])], axis=1)
    if edge_weight is not None:
        loop_w = jnp.full((n,), fill_value, edge_weight.dtype)
        edge_weight = jnp.concatenate([edge_weight, loop_w])
    return out, edge_weight


def add_remaining_self_loops(
    edge_index, edge_weight: Optional[jnp.ndarray] = None,
    fill_value: float = 1.0, num_nodes: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Reference ``loop.py:585``: REMOVES existing self loops and appends
    exactly one per node — the appended loop keeps the last existing
    loop's weight (reference ``loop_attr[...] = edge_attr[inv_mask]``
    assignment) or ``fill_value`` when the node had none. Static-shape
    variant: existing loop weights are zeroed instead of removed."""
    import jax
    coo, size = _unwrap(edge_index)
    n = maybe_num_nodes(coo if size is None else None,
                        num_nodes if num_nodes is not None
                        else (size[0] if size else None))
    e = coo.shape[1]
    if edge_weight is None:
        edge_weight = jnp.ones((e,), jnp.float32)
    loop_mask = coo[0] == coo[1]
    pos = jnp.arange(e)
    idx = jnp.where(loop_mask, coo[0], n)
    last_pos = jax.ops.segment_max(jnp.where(loop_mask, pos, -1), idx,
                                   n + 1)[:n]
    has_loop = last_pos >= 0
    w_exist = edge_weight[jnp.clip(last_pos, 0, e - 1)]
    tail = (1,) * (edge_weight.ndim - 1)   # broadcast over attr dims
    loop_w = jnp.where(has_loop.reshape((n,) + tail), w_exist,
                       jnp.asarray(fill_value,
                                   edge_weight.dtype)).astype(
                                       edge_weight.dtype)
    # zero out (mask) original loop entries; keep shapes static
    edge_weight = jnp.where(loop_mask.reshape((e,) + tail), 0,
                            edge_weight)
    loops = jnp.arange(n, dtype=coo.dtype)
    out = jnp.concatenate([coo, jnp.stack([loops, loops])], axis=1)
    edge_weight = jnp.concatenate([edge_weight, loop_w])
    return out, edge_weight


def remove_self_loops(edge_index, edge_attr: Optional[jnp.ndarray] = None):
    """Drop (i, i) edges (reference ``loop.py:48``). Host-side only
    (dynamic output shape)."""
    import numpy as np
    coo, _ = _unwrap(edge_index)
    coo = np.asarray(coo)
    keep = coo[0] != coo[1]
    out = jnp.asarray(coo[:, keep])
    if edge_attr is not None:
        edge_attr = jnp.asarray(np.asarray(edge_attr)[keep])
    return out, edge_attr


def mask_self_loops(edge_index, num_nodes: int) -> jnp.ndarray:
    """Jit-safe alternative to ``remove_self_loops``: redirect self-loop
    edges at the padding row ``num_nodes`` so segment ops drop them."""
    coo, _ = _unwrap(edge_index)
    is_loop = coo[0] == coo[1]
    pad = jnp.full_like(coo[0], num_nodes)
    return jnp.stack([jnp.where(is_loop, pad, coo[0]),
                      jnp.where(is_loop, pad, coo[1])])


def contains_self_loops(edge_index) -> bool:
    coo, _ = _unwrap(edge_index)
    return bool(jnp.any(coo[0] == coo[1]))
