"""MLP (reference ``nn/models/mlp.py``)."""

from typing import Callable, Optional, Sequence

import flax.linen as fnn
import jax.numpy as jnp


class MLP(fnn.Module):
    """Multi-layer perceptron over a channel list, with optional batch norm
    and dropout (reference ``nn/models/mlp.py:MLP``).

    ``channel_list`` excludes the (lazily inferred) input dim:
    ``MLP(channel_list=[64, 64, 10])`` = 3 Dense layers.
    """
    channel_list: Sequence[int]
    act: Callable = fnn.relu
    norm: Optional[str] = None           # None | 'batch_norm' | 'layer_norm'
    dropout: float = 0.0
    plain_last: bool = True
    use_bias: bool = True
    act_first: bool = False              # reference mlp.py act_first

    @fnn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 **kwargs) -> jnp.ndarray:
        n = len(self.channel_list)
        for i, ch in enumerate(self.channel_list):
            is_last = i == n - 1
            x = fnn.Dense(ch, use_bias=self.use_bias, name=f'lin_{i}')(x)
            if is_last and self.plain_last:
                break
            if self.act_first:
                x = self.act(x)
            if self.norm == 'batch_norm':
                x = fnn.BatchNorm(use_running_average=deterministic,
                                  name=f'norm_{i}')(x)
            elif self.norm == 'layer_norm':
                # torch LayerNorm parity: eps=1e-5, two-pass variance
                x = fnn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                                  name=f'norm_{i}')(x)
            if not self.act_first:
                x = self.act(x)
            if self.dropout > 0 and not deterministic:
                x = fnn.Dropout(self.dropout, deterministic=False)(x)
        return x
