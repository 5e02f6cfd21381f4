"""Learnable set aggregations: attentional pooling, Set2Set, DeepSets.

Reference: ``torch_geometric/nn/aggr/attention.py`` (AttentionalAggregation,
a.k.a. GlobalAttention), ``nn/aggr/set2set.py`` (Set2Set) and
``nn/aggr/deep_sets.py``.
"""

from typing import Callable, Optional

import flax.linen as fnn
import jax.numpy as jnp

from .base import Aggregation
from ...ops import softmax as segment_softmax


class AttentionalAggregation(Aggregation):
    """r_b = sum_i softmax(gate(x_i)) * nn(x_i)
    (reference ``nn/aggr/attention.py``). ``gate_nn`` maps F -> 1 (or F),
    ``nn`` optionally transforms features first."""
    gate_nn: fnn.Module = None
    nn: Optional[fnn.Module] = None

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        gate = self.gate_nn(x)
        h = self.nn(x) if self.nn is not None else x
        alpha = segment_softmax(gate, index, dim_size, mask=mask)
        return self.reduce(alpha * h, index, dim_size, 'sum', mask)


class Set2Set(Aggregation):
    """LSTM-iterated attention pooling (Vinyals et al.); output is
    ``[dim_size, 2F]`` (reference ``nn/aggr/set2set.py``)."""
    in_channels: int = 0
    processing_steps: int = 4

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        f = x.shape[-1]
        cell = fnn.LSTMCell(features=f, name='lstm')
        q_star = jnp.zeros((dim_size, 2 * f), x.dtype)
        carry = cell.initialize_carry(jnp.zeros((2,), jnp.uint32),
                                      (dim_size, 2 * f))
        for _ in range(self.processing_steps):
            carry, q = cell(carry, q_star)
            e = (x * q[index]).sum(-1, keepdims=True)
            a = segment_softmax(e, index, dim_size, mask=mask)
            r = self.reduce(a * x, index, dim_size, 'sum', mask)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


class DeepSetsAggregation(Aggregation):
    """global_nn(sum_i local_nn(x_i)) (reference ``nn/aggr/deep_sets.py``)."""
    local_nn: Optional[fnn.Module] = None
    global_nn: Optional[fnn.Module] = None

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        if self.local_nn is not None:
            x = self.local_nn(x)
        out = self.reduce(x, index, dim_size, 'sum', mask)
        if self.global_nn is not None:
            out = self.global_nn(out)
        return out
