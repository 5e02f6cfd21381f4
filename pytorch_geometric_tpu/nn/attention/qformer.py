"""QFormer — learned-query cross-attention pooling (reference
``torch_geometric/nn/attention/qformer.py``)."""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


class QFormer(fnn.Module):
    """num_queries learned queries cross-attend the input sequence."""
    hidden_channels: int
    num_queries: int = 32
    heads: int = 4
    num_layers: int = 2

    @fnn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        B, N, _ = x.shape
        queries = self.param('queries', fnn.initializers.normal(0.02),
                             (self.num_queries, self.hidden_channels))
        q = jnp.broadcast_to(queries[None],
                             (B,) + queries.shape)
        kv = fnn.Dense(self.hidden_channels, name='in_proj')(x)
        attn_mask = (mask[:, None, None, :] if mask is not None else None)
        for i in range(self.num_layers):
            att = fnn.MultiHeadDotProductAttention(
                num_heads=self.heads, name=f'cross_{i}')(
                    q, kv, mask=attn_mask)
            q = fnn.LayerNorm(name=f'ln1_{i}')(q + att)
            ff = fnn.Dense(self.hidden_channels, name=f'ff_{i}')(
                fnn.gelu(fnn.Dense(2 * self.hidden_channels,
                                   name=f'ffh_{i}')(q)))
            q = fnn.LayerNorm(name=f'ln2_{i}')(q + ff)
        return q[0] if squeeze else q
