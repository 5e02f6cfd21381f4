"""SGFormerAttention — simple global attention (reference
``torch_geometric/nn/attention/sgformer.py``): single-layer linear
attention with normalised q/k."""

from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp


class SGFormerAttention(fnn.Module):
    channels: int
    heads: int = 1

    @fnn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        B, N, _ = x.shape
        H = self.heads
        D = self.channels // H
        q = fnn.Dense(H * D, use_bias=False, name='q')(x).reshape(
            B, N, H, D)
        k = fnn.Dense(H * D, use_bias=False, name='k')(x).reshape(
            B, N, H, D)
        v = fnn.Dense(H * D, use_bias=False, name='v')(x).reshape(
            B, N, H, D)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                            1e-6)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True),
                            1e-6)
        if mask is not None:
            k = k * mask[..., None, None]
            v = v * mask[..., None, None]
        n_valid = (mask.sum(-1)[:, None, None, None] if mask is not None
                   else jnp.asarray(float(N)))
        kv = jnp.einsum('bnhd,bnhe->bhde', k, v)
        num = v + jnp.einsum('bnhd,bhde->bnhe', q, kv)
        den = 1.0 + jnp.einsum('bnhd,bhd->bnh', q, k.sum(1))[..., None]
        out = (num / jnp.maximum(den, 1e-6)).reshape(B, N, H * D)
        return out[0] if squeeze else out
