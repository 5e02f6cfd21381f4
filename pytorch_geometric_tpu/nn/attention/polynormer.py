"""PolynormerAttention — polynomial-expressive linear attention
(reference ``torch_geometric/nn/attention/polynormer.py:8``),
reference-exact: sigmoid q/k kernel trick (optionally shared q=k), the
[B, N, D, H] head layout, LayerNorm(attn) * (h + beta) polynomial gate,
then relu(lin_out). Dropout is inference-disabled (we run eval
semantics)."""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


class PolynormerAttention(fnn.Module):
    channels: int
    heads: int = 1
    head_channels: Optional[int] = None   # reference default 64; None =
    beta: float = 0.9                      # channels // heads
    qkv_bias: bool = False
    qk_shared: bool = True

    @fnn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
            mask = mask[None] if mask is not None else None
        B, N, _ = x.shape
        H = self.heads
        D = self.head_channels or self.channels // self.heads
        h = fnn.Dense(H * D, name='h_lins')(x)
        # reference views [B, N, H*D] as [B, N, D, H] (D-major)
        k = jax.nn.sigmoid(
            fnn.Dense(H * D, use_bias=self.qkv_bias, name='k')(x)
        ).reshape(B, N, D, H)
        if self.qk_shared:
            q = k
        else:
            q = jax.nn.sigmoid(
                fnn.Dense(H * D, use_bias=self.qkv_bias, name='q')(x)
            ).reshape(B, N, D, H)
        v = fnn.Dense(H * D, use_bias=self.qkv_bias,
                      name='v')(x).reshape(B, N, D, H)
        if mask is not None:
            v = v * mask[:, :, None, None]
        kv = jnp.einsum('bndh,bnmh->bdmh', k, v)
        num = jnp.einsum('bndh,bdmh->bnmh', q, kv)
        den = jnp.einsum('bndh,bdh->bnh', q, k.sum(1))[:, :, None, :]
        out = (num / (den + 1e-6)).reshape(B, N, -1)
        out = fnn.LayerNorm(epsilon=1e-5, name='lns')(out) * (h + self.beta)
        out = fnn.relu(fnn.Dense(H * D, name='lin_out')(out))
        return out[0] if squeeze else out
