"""PolynormerAttention (reference
``torch_geometric/nn/attention/polynormer.py``): linear attention with
polynomial gating."""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


class PolynormerAttention(fnn.Module):
    channels: int
    heads: int = 1
    beta: float = 0.9

    @fnn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        B, N, _ = x.shape
        H = self.heads
        D = self.channels // H
        q = jax.nn.sigmoid(fnn.Dense(H * D, name='q')(x)).reshape(
            B, N, H, D)
        k = jax.nn.sigmoid(fnn.Dense(H * D, name='k')(x)).reshape(
            B, N, H, D)
        v = fnn.Dense(H * D, name='v')(x).reshape(B, N, H, D)
        if mask is not None:
            k = k * mask[..., None, None]
            v = v * mask[..., None, None]
        kv = jnp.einsum('bnhd,bnhe->bhde', k, v)
        den = jnp.einsum('bnhd,bhd->bnh', q, k.sum(1))[..., None]
        attn = jnp.einsum('bnhd,bhde->bnhe', q, kv) / jnp.maximum(
            den, 1e-6)
        h = self.param('h_weight', fnn.initializers.ones, (H, D))
        out = (self.beta * attn + (1 - self.beta) * v * h[None, None])
        out = out.reshape(B, N, H * D)
        return out[0] if squeeze else out
