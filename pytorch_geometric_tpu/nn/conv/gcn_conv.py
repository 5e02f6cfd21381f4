"""GCNConv (Kipf & Welling) — reference ``nn/conv/gcn_conv.py:116``.

``gcn_norm`` computes the symmetric normalisation
D^-1/2 (A + I) D^-1/2 as per-edge weights (reference ``gcn_conv.py:45-113``)
— here jit-safe with static num_nodes: self-loop insertion grows E by a
static N.
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...edge_index import EdgeIndex
from ...ops import spmm
from ...utils.loop import add_remaining_self_loops as _add_self_loops


def gcn_norm(edge_index, edge_weight: Optional[jnp.ndarray] = None,
             num_nodes: Optional[int] = None, improved: bool = False,
             add_self_loops: bool = True, flow: str = 'source_to_target',
             dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (edge_index, edge_weight) with D^-1/2 A_hat D^-1/2 weights."""
    if isinstance(edge_index, EdgeIndex):
        num_nodes = edge_index.num_src_nodes
        coo = edge_index.coo
    else:
        coo = jnp.asarray(edge_index)
        if num_nodes is None:
            raise ValueError('gcn_norm requires static num_nodes')

    fill = 2.0 if improved else 1.0
    if edge_weight is None:
        edge_weight = jnp.ones((coo.shape[1],), dtype)
    if add_self_loops:
        coo, edge_weight = _add_self_loops(coo, edge_weight,
                                           fill_value=fill,
                                           num_nodes=num_nodes)

    idx = coo[1] if flow == 'source_to_target' else coo[0]
    # padded edges (endpoint == num_nodes) must not contribute to degrees
    w = jnp.where(idx < num_nodes, edge_weight, 0)
    deg = jax.ops.segment_sum(w.astype(dtype),
                              jnp.minimum(idx, num_nodes - 1), num_nodes)
    # zero-degree rows get 0 (reference masks inf -> 0, gcn_conv.py:100)
    deg_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg,
                                                                1e-12)),
                             0.0)
    src = jnp.minimum(coo[0], num_nodes - 1)
    dst = jnp.minimum(coo[1], num_nodes - 1)
    norm = deg_inv_sqrt[src] * w * deg_inv_sqrt[dst]
    return coo, norm


def cache_gcn_norm(edge_index: EdgeIndex, improved: bool = False,
                   add_self_loops: bool = True,
                   block_sparse: Optional[bool] = None,
                   cache_dtype=None, auto: bool = False) -> EdgeIndex:
    """TPU-idiomatic ``GCNConv(cached=True)`` (reference
    ``gcn_conv.py:116``): compute D^-1/2 (A+I) D^-1/2 ONCE on the host
    and bake it into the EdgeIndex caches — the dense ``[N, N]``
    adjacency when it fits (one MXU matmul per layer, 83-87% of HBM
    roofline on v5e), the hybrid block-sparse layout past the dense cap,
    and the node-blocked Pallas layout as the general fallback.

    Use with ``GCNConv(..., normalize=False, add_self_loops=False)``::

        ei = cache_gcn_norm(EdgeIndex(coo, (n, n)))
        conv = GCNConv(64, normalize=False, add_self_loops=False)

    Flax modules are stateless across calls, so the reference's
    in-module caching maps to this explicit one-time transform.

    ``auto=True`` delegates regime + dtype choice to the one-knob
    ``fill_cache(auto=True)`` policy (HBM-sized dense cap, bf16 cache
    on TPU, silent fall-through to chunked/gather past BSR).
    """
    import numpy as np
    coo = (edge_index._coo_host if edge_index._coo_host is not None
           else np.asarray(edge_index.coo))
    n = edge_index.num_src_nodes
    row, col = coo[0].astype(np.int64), coo[1].astype(np.int64)
    valid = (row < n) & (col < n)
    row, col = row[valid], col[valid]
    if add_self_loops:
        # add_remaining_self_loops semantics (reference loop.py:585):
        # one loop per node; nodes that already had one keep its weight
        # (1 here), the rest get fill_value
        had_loop = np.zeros(n, bool)
        had_loop[row[row == col]] = True
        keep = row != col
        row, col = row[keep], col[keep]
        loops = np.arange(n, dtype=np.int64)
        loop_w = np.where(had_loop, 1.0, 2.0 if improved else 1.0)
        row = np.concatenate([row, loops])
        col = np.concatenate([col, loops])
        w = np.concatenate([np.ones(len(row) - n, np.float64), loop_w])
    else:
        w = np.ones(len(row), np.float64)
    deg = np.bincount(col, weights=w, minlength=n)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    norm = (dinv[row] * w * dinv[col]).astype(np.float32)
    coo_n = np.stack([row, col]).astype(np.int32)
    return EdgeIndex(coo_n, (n, n)).fill_cache(
        dense_weight=norm, block_sparse=block_sparse,
        cache_dtype=cache_dtype, auto=auto)


class GCNConv(MessagePassing):
    """x' = D^-1/2 (A+I) D^-1/2 x W + b (reference ``gcn_conv.py:116``)."""
    out_channels: int
    improved: bool = False
    add_self_loops: bool = True
    normalize: bool = True
    use_bias: bool = True
    aggr: str = 'sum'
    # A(xW) == (Ax)W: propagate-first keeps the SpMM on the narrower
    # side when in <= out, and at layer 1 (leaf input) it lets XLA
    # dead-code the backward A^T pass (grad_W = (Ax)^T g needs no
    # transpose SpMM) — one of 6 [N,N] passes on the GCN protocol
    # bench. None = auto (propagate first iff in_channels <= out).
    propagate_first: Optional[bool] = None

    @fnn.compact
    def __call__(self, x: jnp.ndarray, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        num_nodes = x.shape[0]
        if self.normalize:
            edge_index_n, edge_weight = gcn_norm(
                edge_index, edge_weight, num_nodes, self.improved,
                self.add_self_loops)
            if edge_mask is not None:
                # grown by N static self-loop edges, all valid
                edge_mask = jnp.concatenate(
                    [edge_mask, jnp.ones((num_nodes,), bool)])
            edge_index = edge_index_n

        lin = fnn.Dense(self.out_channels, use_bias=False,
                        kernel_init=fnn.initializers.glorot_uniform(),
                        name='lin')
        prop_first = self.propagate_first
        if prop_first is None:
            # reassociation only commutes with LINEAR aggregations
            prop_first = (x.shape[-1] <= self.out_channels
                          and self._aggr() in ('sum', 'add', 'mean'))
        if prop_first:
            out = lin(self.propagate(edge_index, x=x,
                                     edge_weight=edge_weight,
                                     size=(num_nodes, num_nodes),
                                     edge_mask=edge_mask))
        else:
            out = self.propagate(edge_index, x=lin(x),
                                 edge_weight=edge_weight,
                                 size=(num_nodes, num_nodes),
                                 edge_mask=edge_mask)
        if self.use_bias:
            bias = self.param('bias', fnn.initializers.zeros,
                              (self.out_channels,))
            out = out + bias
        return out

    def message(self, x_j, edge_weight=None):
        # reference gcn_conv.py:270
        if edge_weight is None:
            return x_j
        return edge_weight[:, None] * x_j

    def message_and_aggregate(self, edge_index, x=None, edge_weight=None,
                              **kwargs):
        # reference gcn_conv.py:273 — fused SpMM when CSR/CSC is cached
        if not isinstance(edge_index, EdgeIndex) or edge_index.csc is None:
            return NotImplemented
        return spmm(edge_index, x, edge_weight, reduce=self._aggr())
