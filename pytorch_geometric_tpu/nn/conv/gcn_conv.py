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


class GCNConv(MessagePassing):
    """x' = D^-1/2 (A+I) D^-1/2 x W + b (reference ``gcn_conv.py:116``)."""
    out_channels: int
    improved: bool = False
    add_self_loops: bool = True
    normalize: bool = True
    use_bias: bool = True
    aggr: str = 'sum'

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

        x = fnn.Dense(self.out_channels, use_bias=False,
                      kernel_init=fnn.initializers.glorot_uniform(),
                      name='lin')(x)
        out = self.propagate(edge_index, x=x, edge_weight=edge_weight,
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
