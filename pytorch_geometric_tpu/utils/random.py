"""Stochastic graph utilities (jit-safe, explicit PRNG keys).

Reference: ``torch_geometric/utils/dropout.py`` (dropout_edge/node) and
``negative_sampling.py``. JAX redesign: all take a ``jax.random`` key and
keep shapes static — dropout *masks* edges (points them at the padding
row) rather than shrinking E, and negative sampling draws a fixed count
with rejection folded into a resample loop of static depth.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dropout_edge(key, edge_index, p: float = 0.5,
                 num_nodes: Optional[int] = None,
                 training: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly mask edges with prob ``p`` (reference ``dropout.py:132``).
    Returns (edge_index with dropped edges redirected to row ``num_nodes``,
    keep_mask). Static shapes throughout."""
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    if not training or p == 0.0:
        return coo, jnp.ones((coo.shape[1],), bool)
    if num_nodes is None:
        raise ValueError("dropout_edge requires static num_nodes under jit")
    keep = jax.random.bernoulli(key, 1.0 - p, (coo.shape[1],))
    pad = jnp.full_like(coo[0], num_nodes)
    out = jnp.where(keep[None, :], coo, pad[None, :])
    return out, keep


def dropout_node(key, edge_index, p: float = 0.5,
                 num_nodes: Optional[int] = None, training: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mask all edges incident to dropped nodes (reference
    ``dropout.py:55``). Returns (edge_index, edge_mask, node_mask)."""
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    if not training or p == 0.0:
        return (coo, jnp.ones((coo.shape[1],), bool),
                jnp.ones((num_nodes,), bool))
    node_keep = jax.random.bernoulli(key, 1.0 - p, (num_nodes,))
    src_ok = node_keep[jnp.minimum(coo[0], num_nodes - 1)]
    dst_ok = node_keep[jnp.minimum(coo[1], num_nodes - 1)]
    keep = src_ok & dst_ok & (coo[0] < num_nodes)
    pad = jnp.full_like(coo[0], num_nodes)
    out = jnp.where(keep[None, :], coo, pad[None, :])
    return out, keep, node_keep


def negative_sampling(key, edge_index, num_nodes: int,
                      num_neg_samples: int,
                      num_resample_rounds: int = 3) -> jnp.ndarray:
    """Sample non-edges (reference ``utils/negative_sampling.py:18``).

    Fixed-shape variant: draws ``num_neg_samples`` candidate pairs, then a
    static number of rejection rounds re-draws collisions with existing
    edges. Residual collisions after the final round are left in place
    (vanishingly rare on sparse graphs), matching the reference's
    best-effort dense fallback semantics.
    """
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    pos_key = coo[0].astype(jnp.int64) * num_nodes + coo[1].astype(jnp.int64)
    pos_sorted = jnp.sort(pos_key)

    def is_pos(cand):
        i = jnp.searchsorted(pos_sorted, cand)
        i = jnp.minimum(i, pos_sorted.shape[0] - 1)
        return pos_sorted[i] == cand

    def draw(k):
        return jax.random.randint(
            k, (num_neg_samples,), 0,
            num_nodes * num_nodes, dtype=jnp.int64)

    key, sub = jax.random.split(key)
    cand = draw(sub)
    for _ in range(num_resample_rounds):
        key, sub = jax.random.split(key)
        redraw = draw(sub)
        cand = jnp.where(is_pos(cand), redraw, cand)
    return jnp.stack([cand // num_nodes,
                      cand % num_nodes]).astype(coo.dtype)


def batched_negative_sampling(key, edge_index, batch: jnp.ndarray,
                              num_nodes: int, num_neg_samples: int):
    """Per-graph negative sampling within a batch (reference
    ``negative_sampling.py:batched_negative_sampling``) — approximated by
    global sampling restricted to same-graph pairs via resampling."""
    neg = negative_sampling(key, edge_index, num_nodes, num_neg_samples)
    same = batch[neg[0]] == batch[neg[1]]
    pad = jnp.full_like(neg[0], num_nodes)
    return jnp.where(same[None, :], neg, pad[None, :])
