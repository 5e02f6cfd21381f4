"""DNAConv + PANConv.

Reference: ``nn/conv/dna_conv.py`` (just-jump attention over the stack
of all previous layer representations) and ``pan_conv.py`` (path
integral: MET matrix as weighted sum of adjacency powers).
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import scatter, softmax as segment_softmax


class DNAConv(MessagePassing):
    """Dynamic neighborhood aggregation (reference ``dna_conv.py``):
    x has shape [N, L, F] (all previous layer outputs); attention
    queries the current layer against neighbors' stacks."""
    channels: int
    heads: int = 1
    groups: int = 1

    @fnn.compact
    def __call__(self, x: jnp.ndarray, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, L, F = x.shape
        H = self.heads
        D = self.channels // H
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        q = fnn.Dense(H * D, use_bias=False, name='q')(
            x[:, -1])                                    # [N, H*D]
        k = fnn.Dense(H * D, use_bias=False, name='k')(x)  # [N, L, H*D]
        v = fnn.Dense(H * D, use_bias=False, name='v')(x)
        q = q.reshape(n, H, D)
        k = k.reshape(n, L, H, D)
        v = v.reshape(n, L, H, D)
        # per-edge attention over the source's L layer slots
        logits = jnp.einsum('ehd,elhd->elh', q[dst], k[src]) \
            / jnp.sqrt(D)                                 # [E, L, H]
        alpha = jax.nn.softmax(logits, axis=1)
        msg = jnp.einsum('elh,elhd->ehd', alpha, v[src])  # [E, H, D]
        out = scatter(msg.reshape(-1, H * D), dst, n, 'mean',
                      mask=edge_mask)
        return out.reshape(n, H * D)


class PANConv(MessagePassing):
    """Path-integral conv (reference ``pan_conv.py``): out = MET(A) X W
    with MET = sum_k e^{-k/L} A^k, normalised."""
    out_channels: int
    filter_size: int = 3

    @fnn.compact
    def __call__(self, x: jnp.ndarray, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        h = fnn.Dense(self.out_channels, name='lin')(x)

        def prop(v):
            m = v[src]
            if edge_mask is not None:
                m = jnp.where(edge_mask[:, None], m, 0)
            return jax.ops.segment_sum(m, dst, n)

        out = h
        acc = h
        weight = 1.0
        total = 1.0
        for k in range(1, self.filter_size + 1):
            out = prop(out)
            weight = jnp.exp(-float(k) / self.filter_size)
            acc = acc + weight * out
            total += weight
        return acc / total
