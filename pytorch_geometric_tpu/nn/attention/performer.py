"""PerformerAttention — FAVOR+ linear attention.

Reference: ``torch_geometric/nn/attention/performer.py``. Kernelised
softmax attention in O(N): phi(q) (phi(k)^T v). Maps beautifully onto
the MXU (two dense matmuls instead of an N x N score matrix).
"""

from typing import Callable, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


def _orthogonal_gaussian(key, rows: int, cols: int) -> jnp.ndarray:
    """Block-orthogonal random projection (reference performer.py
    orthogonal_matrix)."""
    blocks = []
    remaining = rows
    while remaining > 0:
        key, sub = jax.random.split(key)
        g = jax.random.normal(sub, (cols, cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T[:min(remaining, cols)])
        remaining -= cols
    m = jnp.concatenate(blocks, 0)
    key, sub = jax.random.split(key)
    norms = jnp.sqrt(jax.random.chisquare(sub, cols, (rows,)))
    return m * norms[:, None]


def softmax_kernel(x: jnp.ndarray, projection: jnp.ndarray,
                   is_query: bool, eps: float = 1e-4) -> jnp.ndarray:
    """FAVOR+ positive random features."""
    d = x.shape[-1]
    ratio = projection.shape[0] ** -0.5
    xp = (x / (d ** 0.25)) @ projection.T
    x2 = (x ** 2).sum(-1, keepdims=True) / (2 * (d ** 0.5))
    if is_query:
        stab = xp.max(-1, keepdims=True)
    else:
        stab = xp.max()
    return ratio * (jnp.exp(xp - x2 - stab) + eps)


class PerformerAttention(fnn.Module):
    """Multi-head FAVOR+ attention over a (batched) node sequence
    (reference ``attention/performer.py``)."""
    channels: int
    heads: int = 1
    num_features: Optional[int] = None

    @fnn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        B, N, _ = x.shape
        H = self.heads
        D = self.channels // H
        m = self.num_features or max(int(D * 0.5) * 2, 16)
        q = fnn.Dense(H * D, name='q')(x).reshape(B, N, H, D)
        k = fnn.Dense(H * D, name='k')(x).reshape(B, N, H, D)
        v = fnn.Dense(H * D, name='v')(x).reshape(B, N, H, D)
        proj = self.param('projection',
                          lambda key, s: _orthogonal_gaussian(key, *s),
                          (m, D))
        proj = jax.lax.stop_gradient(proj)
        qp = softmax_kernel(q, proj, True)     # [B, N, H, M]
        kp = softmax_kernel(k, proj, False)
        if mask is not None:
            kp = kp * mask[..., None, None]
            v = v * mask[..., None, None]
        kv = jnp.einsum('bnhm,bnhd->bhmd', kp, v)
        z = 1.0 / jnp.maximum(
            jnp.einsum('bnhm,bhm->bnh', qp, kp.sum(1)), 1e-6)
        out = jnp.einsum('bnhm,bhmd,bnh->bnhd', qp, kv, z)
        out = out.reshape(B, N, H * D)
        out = fnn.Dense(self.channels, name='out')(out)
        return out[0] if squeeze else out
