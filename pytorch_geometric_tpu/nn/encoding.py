"""PositionalEncoding + TemporalEncoding + TimeEncoder
(reference ``torch_geometric/nn/encoding.py:13,70`` and
``nn/models/tgn.py:215``)."""

import math

import flax.linen as fnn
import jax.numpy as jnp


class PositionalEncoding(fnn.Module):
    """Sinusoidal encoding of scalar positions (reference
    ``encoding.py:13``): frequencies ``logspace(0, 1, c/2, base_freq)``,
    output ``[sin(x f), cos(x f)]``."""
    out_channels: int
    base_freq: float = 1e-4
    granularity: float = 1.0

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.out_channels
        if c % 2 != 0:
            raise ValueError(
                f"Cannot use sinusoidal positional encoding with odd "
                f"'out_channels' (got {c}).")
        pos = x / self.granularity if self.granularity != 1.0 else x
        freqs = jnp.logspace(0.0, 1.0, c // 2, base=self.base_freq)
        args = pos[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], -1)


class TemporalEncoding(fnn.Module):
    """Parameter-free exponential-decay cosine time encoding (reference
    ``encoding.py:70``, the GraphMixer paper):
    ``y_i = cos(x * sqrt(d)^{-linspace(0, sqrt(d), d)_i})``."""
    out_channels: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        c = self.out_channels
        sqrt_c = math.sqrt(c)
        w = 1.0 / sqrt_c ** jnp.linspace(0.0, sqrt_c, c)
        return jnp.cos(t[:, None] * w[None, :])


class TimeEncoder(fnn.Module):
    """Learned cosine time encoding ``cos(W t + b)`` (reference
    ``nn/models/tgn.py:215``, used by the TGN memory)."""
    out_channels: int

    @fnn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.cos(fnn.Dense(self.out_channels, name='lin')(
            t[:, None].astype(jnp.float32)))
