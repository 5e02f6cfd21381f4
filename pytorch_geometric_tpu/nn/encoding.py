"""PositionalEncoding + TemporalEncoding
(reference ``torch_geometric/nn/encoding.py:13,71``)."""

import math

import flax.linen as fnn
import jax.numpy as jnp


class PositionalEncoding(fnn.Module):
    """Sinusoidal encoding of scalar positions (reference
    ``encoding.py:13``)."""
    out_channels: int
    base_freq: float = 1e-4
    granularity: float = 1.0

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.out_channels
        pos = x / self.granularity
        freqs = self.base_freq ** (2 * (jnp.arange(c // 2) / c))
        args = pos[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], -1)


class TemporalEncoding(fnn.Module):
    """cos(t w + b) time encoding (TGN-style; reference
    ``encoding.py:71``)."""
    out_channels: int

    @fnn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        c = self.out_channels
        sqrt_c = 1.0 / math.sqrt(c)
        w = self.param('lin', fnn.initializers.normal(1.0), (1, c))
        b = self.param('bias', fnn.initializers.zeros, (c,))
        return sqrt_c * jnp.cos(t[:, None] * w + b)
