"""Select/Connect pooling framework, static-shape edition.

Reference: ``torch_geometric/nn/pool/select/base.py`` (SelectOutput),
``select/topk.py:51`` (SelectTopK) and ``connect/filter_edges.py``.
The reference emits variable-length node subsets; on TPU selection keeps a
**static** ``k`` slots per graph with a validity mask — unselected slots
are masked out and edges touching them are dropped by the segment ops.
"""

import math
from typing import NamedTuple, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ...utils.dense import to_dense_batch


class SelectOutput(NamedTuple):
    """Static-shape selection result.

    node_index: int32 [B*k] — original node row per kept slot (clamped for
        invalid slots; use ``mask``).
    mask:       bool  [B*k] — slot validity.
    weight:     f32   [B*k] — selection score (gating multiplier).
    batch:      int32 [B*k] — graph id per slot.
    cluster_size: static int — k (slots per graph).
    """
    node_index: jnp.ndarray
    mask: jnp.ndarray
    weight: jnp.ndarray
    batch: jnp.ndarray
    cluster_size: int


def select_topk(score: jnp.ndarray, batch: jnp.ndarray, batch_size: int,
                ratio: float, max_nodes_per_graph: int,
                min_score: Optional[float] = None,
                node_mask: Optional[jnp.ndarray] = None) -> SelectOutput:
    """Per-graph top-k by score (reference ``select/topk.py:51``).

    ``k = ceil(ratio * max_nodes_per_graph)`` slots are kept per graph;
    slots beyond each graph's own ``ceil(ratio * n_g)`` (or below
    ``min_score``) are masked invalid — reference semantics with static
    shapes.
    """
    n = score.shape[0]
    L = max_nodes_per_graph
    k = max(1, math.ceil(ratio * L)) if min_score is None else L
    # Dense [B, L] scores with -inf padding; remember original row ids.
    dense_score, valid = to_dense_batch(score[:, None], batch, batch_size, L,
                                        fill_value=-jnp.inf)
    dense_score = dense_score[..., 0]
    dense_score = jnp.where(valid, dense_score, -jnp.inf)
    rows = jnp.arange(n, dtype=jnp.int32)
    dense_rows, _ = to_dense_batch(rows[:, None], batch, batch_size, L)
    dense_rows = dense_rows[..., 0]
    if node_mask is not None:
        dense_nm, _ = to_dense_batch(node_mask[:, None].astype(jnp.int32),
                                     batch, batch_size, L)
        dense_score = jnp.where(dense_nm[..., 0] > 0, dense_score, -jnp.inf)

    top_score, top_pos = jax.lax.top_k(dense_score, k)          # [B, k]
    top_row = jnp.take_along_axis(dense_rows, top_pos, axis=1)  # [B, k]

    counts = valid.sum(1)                                       # [B]
    if min_score is None:
        per_graph_k = jnp.ceil(ratio * counts.astype(jnp.float32)
                               ).astype(jnp.int32)
        slot = jnp.arange(k, dtype=jnp.int32)[None, :]
        keep = (slot < per_graph_k[:, None]) & jnp.isfinite(top_score)
    else:
        keep = (top_score > min_score) & jnp.isfinite(top_score)

    b = jnp.repeat(jnp.arange(batch_size, dtype=jnp.int32), k)
    return SelectOutput(
        node_index=top_row.reshape(-1),
        mask=keep.reshape(-1),
        weight=jnp.where(keep, top_score, 0.0).reshape(-1),
        batch=b,
        cluster_size=k,
    )


def filter_edges(edge_index, select: SelectOutput, num_nodes: int):
    """Relabel edges onto kept slots; edges touching dropped nodes point at
    the dump row (reference ``connect/filter_edges.py``).

    Returns (new_edge_index [2, E], edge_mask [E]).
    """
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    new_n = select.node_index.shape[0]
    # old node id -> new slot (or new_n when dropped)
    old2new = jnp.full((num_nodes + 1,), new_n, jnp.int32)
    slot_ids = jnp.arange(new_n, dtype=jnp.int32)
    src_rows = jnp.where(select.mask, select.node_index, num_nodes)
    old2new = old2new.at[src_rows].set(jnp.where(select.mask, slot_ids,
                                                 new_n))
    src = old2new[jnp.minimum(coo[0], num_nodes)]
    dst = old2new[jnp.minimum(coo[1], num_nodes)]
    keep = (src < new_n) & (dst < new_n)
    new_coo = jnp.stack([jnp.where(keep, src, new_n),
                         jnp.where(keep, dst, new_n)])
    return new_coo, keep


class SelectTopK(fnn.Module):
    """Learnable scoring + top-k selection (reference ``select/topk.py:51``)."""
    in_channels: int
    ratio: float = 0.5
    min_score: Optional[float] = None
    act: str = 'tanh'

    @fnn.compact
    def __call__(self, x: jnp.ndarray, batch: jnp.ndarray, batch_size: int,
                 max_nodes_per_graph: int,
                 node_mask: Optional[jnp.ndarray] = None) -> SelectOutput:
        w = self.param('weight', fnn.initializers.glorot_uniform(),
                       (self.in_channels, 1))
        score = (x @ w)[:, 0] / jnp.maximum(jnp.linalg.norm(w), 1e-12)
        if self.min_score is None:
            score = jnp.tanh(score) if self.act == 'tanh' else score
        else:
            from ...ops import softmax as segment_softmax
            score = segment_softmax(score, batch, batch_size, mask=node_mask)
        return select_topk(score, batch, batch_size, self.ratio,
                           max_nodes_per_graph, self.min_score, node_mask)
