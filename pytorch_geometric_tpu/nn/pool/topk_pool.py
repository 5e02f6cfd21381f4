"""TopKPooling and SAGPooling (reference ``nn/pool/topk_pool.py:11`` and
``nn/pool/sag_pool.py``), built on the static-shape Select/Connect
framework."""

from typing import NamedTuple, Optional

import flax.linen as fnn
import jax.numpy as jnp

from .select import SelectTopK, SelectOutput, filter_edges, select_topk
from ..message_passing import MessagePassing
from ...ops import softmax as segment_softmax


class PoolOutput(NamedTuple):
    x: jnp.ndarray           # [B*k, F] gated features of kept slots
    edge_index: jnp.ndarray  # [2, E] relabeled (dropped edges -> dump row)
    edge_mask: jnp.ndarray   # [E]
    batch: jnp.ndarray       # [B*k]
    node_mask: jnp.ndarray   # [B*k]
    perm: jnp.ndarray        # [B*k] original node rows
    score: jnp.ndarray       # [B*k]


def _gather_pool(x, edge_index, select: SelectOutput, num_nodes,
                 multiplier: float = 1.0) -> PoolOutput:
    safe_rows = jnp.minimum(select.node_index, num_nodes - 1)
    new_x = x[safe_rows] * select.weight[:, None]
    new_x = jnp.where(select.mask[:, None], new_x, 0) * multiplier
    new_coo, keep = filter_edges(edge_index, select, num_nodes)
    return PoolOutput(new_x, new_coo, keep, select.batch, select.mask,
                      select.node_index, select.weight)


class TopKPooling(fnn.Module):
    """Gao & Ji 'Graph U-Nets' pooling (reference ``topk_pool.py:11``)."""
    in_channels: int
    ratio: float = 0.5
    min_score: Optional[float] = None
    multiplier: float = 1.0

    @fnn.compact
    def __call__(self, x, edge_index, batch=None, batch_size: int = 1,
                 max_nodes_per_graph: Optional[int] = None,
                 node_mask: Optional[jnp.ndarray] = None) -> PoolOutput:
        n = x.shape[0]
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        L = max_nodes_per_graph or n
        select = SelectTopK(self.in_channels, self.ratio, self.min_score,
                            name='select')(x, batch, batch_size, L,
                                           node_mask)
        return _gather_pool(x, edge_index, select, n, self.multiplier)


class SAGPooling(fnn.Module):
    """Self-attention pooling: scores come from a GNN over the graph
    (reference ``nn/pool/sag_pool.py``)."""
    in_channels: int
    ratio: float = 0.5
    min_score: Optional[float] = None
    multiplier: float = 1.0

    @fnn.compact
    def __call__(self, x, edge_index, batch=None, batch_size: int = 1,
                 max_nodes_per_graph: Optional[int] = None,
                 node_mask: Optional[jnp.ndarray] = None) -> PoolOutput:
        from ..conv import GraphConv
        n = x.shape[0]
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        L = max_nodes_per_graph or n
        attn = GraphConv(out_channels=1, name='gnn')(x, edge_index)
        # reference sag_pool.py:90 routes the GNN score through
        # SelectTopK(1): a learnable 1-d reweighting before tanh/softmax
        select = SelectTopK(1, self.ratio, self.min_score,
                            name='select')(attn, batch, batch_size, L,
                                           node_mask)
        return _gather_pool(x, edge_index, select, n, self.multiplier)


class PANPooling(fnn.Module):
    """PAN pooling (reference ``nn/pool/pan_pool.py:14``): node score is a
    learned mix of the projected features and the MET-matrix diagonal
    (here approximated by the weighted self-degree of the PAN propagation,
    i.e. the node's own aggregated magnitude), followed by top-k selection."""
    in_channels: int
    ratio: float = 0.5
    min_score: Optional[float] = None
    multiplier: float = 1.0

    @fnn.compact
    def __call__(self, x, edge_index, batch=None, batch_size: int = 1,
                 max_nodes_per_graph: Optional[int] = None,
                 node_mask: Optional[jnp.ndarray] = None) -> PoolOutput:
        n = x.shape[0]
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        L = max_nodes_per_graph or n
        p = self.param('p', fnn.initializers.ones, (self.in_channels,))
        beta = self.param('beta', fnn.initializers.ones, (2,))
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        # diagonal proxy: self-loop weight of A + A^T (MET diag term)
        diag = jnp.zeros((n,)).at[dst].add(
            jnp.where(src == dst, 1.0, 0.0))
        score = beta[0] * (x @ p) + beta[1] * diag
        score = jnp.tanh(score) if self.min_score is None else score
        select = select_topk(score, batch, batch_size, self.ratio, L,
                             self.min_score, node_mask)
        return _gather_pool(x, edge_index, select, n, self.multiplier)
