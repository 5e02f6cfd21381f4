"""Ragged -> padded conversions (the key TPU-friendly utilities).

Reference: ``torch_geometric/utils/_to_dense_batch.py:14`` and
``_to_dense_adj.py``. Both take static ``max_num_nodes`` / ``batch_size``
so they are jit-safe and feed the dense (padded-batch) model family.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def to_dense_batch(x: jnp.ndarray, batch: Optional[jnp.ndarray],
                   batch_size: int, max_num_nodes: int,
                   fill_value: float = 0.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter node features ``[N, F]`` into ``[B, N_max, F]`` + bool mask.

    Unlike the reference, ``batch_size`` and ``max_num_nodes`` are required
    (static) — the reference's dynamic inference is host-side work.
    """
    n = x.shape[0]
    if batch is None:
        batch = jnp.zeros((n,), jnp.int32)
    # position of each node within its graph
    ones = jnp.ones((n,), jnp.int32)
    counts = jnp.cumsum(jax.nn.one_hot(batch, batch_size, dtype=jnp.int32),
                        axis=0)
    pos = counts[jnp.arange(n), batch] - 1
    valid = pos < max_num_nodes
    flat_idx = jnp.where(valid, batch * max_num_nodes + pos,
                         batch_size * max_num_nodes)
    out = jnp.full((batch_size * max_num_nodes + 1,) + x.shape[1:],
                   fill_value, x.dtype)
    out = out.at[flat_idx].set(x)
    out = out[:-1].reshape((batch_size, max_num_nodes) + x.shape[1:])
    mask = jnp.zeros((batch_size * max_num_nodes + 1,), bool)
    mask = mask.at[flat_idx].set(valid)
    mask = mask[:-1].reshape(batch_size, max_num_nodes)
    return out, mask


def to_dense_adj(edge_index, batch: Optional[jnp.ndarray],
                 batch_size: int, max_num_nodes: int,
                 edge_attr: Optional[jnp.ndarray] = None,
                 num_nodes: Optional[int] = None) -> jnp.ndarray:
    """Build padded dense adjacency ``[B, N_max, N_max(, F)]``
    (reference ``utils/_to_dense_adj.py:14``)."""
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    src, dst = coo[0], coo[1]
    if batch is None:
        b = jnp.zeros_like(src)
        pos_src, pos_dst = src, dst
    else:
        b = batch[src]
        ptr_like = jnp.cumsum(
            jax.ops.segment_sum(jnp.ones_like(batch), batch, batch_size))
        start = jnp.concatenate([jnp.zeros((1,), ptr_like.dtype),
                                 ptr_like[:-1]])
        pos_src = src - start[b]
        pos_dst = dst - start[batch[dst]]
    valid = (pos_src < max_num_nodes) & (pos_dst < max_num_nodes)
    flat = jnp.where(valid,
                     (b * max_num_nodes + pos_src) * max_num_nodes + pos_dst,
                     batch_size * max_num_nodes * max_num_nodes)
    if edge_attr is None:
        vals = jnp.ones((coo.shape[1],), jnp.float32)
        out = jnp.zeros((batch_size * max_num_nodes * max_num_nodes + 1,),
                        jnp.float32)
    else:
        vals = edge_attr
        out = jnp.zeros((batch_size * max_num_nodes * max_num_nodes + 1,)
                        + edge_attr.shape[1:], edge_attr.dtype)
    out = out.at[flat].add(vals)
    shape = (batch_size, max_num_nodes, max_num_nodes)
    if edge_attr is not None:
        shape = shape + edge_attr.shape[1:]
    return out[:-1].reshape(shape)


def dense_to_sparse(adj: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
    """Dense [N, N] (or [B, N, N]) -> COO + values. Host-side only
    (dynamic output length) — reference ``utils/sparse.py:dense_to_sparse``."""
    import numpy as np
    a = np.asarray(adj)
    if a.ndim == 2:
        r, c = np.nonzero(a)
        return np.stack([r, c]).astype(np.int32), a[r, c]
    assert a.ndim == 3
    n = a.shape[1]
    b, r, c = np.nonzero(a)
    return (np.stack([b * n + r, b * n + c]).astype(np.int32), a[b, r, c])
