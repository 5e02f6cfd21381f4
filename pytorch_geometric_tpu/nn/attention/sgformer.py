"""SGFormerAttention — simple global linear attention (reference
``torch_geometric/nn/attention/sgformer.py:7``), reference-exact:
q/k are L2-normalised per head (exact zeros replaced by 1e-6 first,
``sgformer.py:66-68``), the numerator adds ``N * v`` and the
denominator adds ``N``, and heads are combined by MEAN so the output
has ``head_channels`` features (``sgformer.py:89``)."""

from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp


class SGFormerAttention(fnn.Module):
    channels: int
    heads: int = 1
    head_channels: Optional[int] = None   # reference default 64; None =
    qkv_bias: bool = False                 # channels (SGModule usage)

    @fnn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
            mask = mask[None] if mask is not None else None
        B, N, _ = x.shape
        H = self.heads
        D = self.head_channels or self.channels
        q = fnn.Dense(H * D, use_bias=self.qkv_bias, name='q')(x)
        k = fnn.Dense(H * D, use_bias=self.qkv_bias, name='k')(x)
        v = fnn.Dense(H * D, use_bias=self.qkv_bias, name='v')(x)
        q = q.reshape(B, N, H, D)
        k = k.reshape(B, N, H, D)
        v = v.reshape(B, N, H, D)
        if mask is not None:
            v = v * mask[:, :, None, None]
        # exact zeros -> epsilon before normalisation (this is what keeps
        # fully-zero padded rows finite in the reference; note padded k
        # rows then still contribute 1/sqrt(D) vectors to the denominator
        # — reference quirk preserved)
        eps = 1e-6
        q = jnp.where(q == 0, eps, q)
        k = jnp.where(k == 0, eps, k)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
        kv = jnp.einsum('blhm,blhd->bhmd', k, v)
        num = jnp.einsum('bnhm,bhmd->bnhd', q, kv) + N * v
        den = jnp.einsum('bnhm,bhm->bnh', q, k.sum(1))[..., None] + N
        out = (num / den).mean(2)             # [B, N, D]
        return out[0] if squeeze else out
