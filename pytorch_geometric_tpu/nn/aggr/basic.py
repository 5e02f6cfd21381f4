"""Basic aggregations (reference ``torch_geometric/nn/aggr/basic.py``)."""

from typing import Optional

import jax
import jax.numpy as jnp

import flax.linen as fnn

from .base import Aggregation
from ...ops import scatter, softmax as segment_softmax


class SumAggregation(Aggregation):
    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        return self.reduce(x, index, dim_size, 'sum', mask)


class MeanAggregation(Aggregation):
    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        return self.reduce(x, index, dim_size, 'mean', mask)


class MaxAggregation(Aggregation):
    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        return self.reduce(x, index, dim_size, 'max', mask)


class MinAggregation(Aggregation):
    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        return self.reduce(x, index, dim_size, 'min', mask)


class MulAggregation(Aggregation):
    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        return self.reduce(x, index, dim_size, 'mul', mask)


class VarAggregation(Aggregation):
    """E[x^2] - E[x]^2 per segment (reference ``basic.py:VarAggregation``)."""
    semi_grad: bool = False

    def _var(self, x, index, dim_size, mask):
        mean = self.reduce(x, index, dim_size, 'mean', mask)
        mean2 = self.reduce(x * x, index, dim_size, 'mean', mask)
        return jnp.maximum(mean2 - mean * mean, 0)

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        return self._var(x, index, dim_size, mask)


class StdAggregation(VarAggregation):
    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        # reference basic.py:137-138: clamp for sqrt-at-0 grad, then
        # zero out the "undefined" (var ~ 0) entries
        out = jnp.sqrt(jnp.maximum(self._var(x, index, dim_size, mask),
                                   1e-5))
        return jnp.where(out <= jnp.sqrt(1e-5), 0.0, out)


class SoftmaxAggregation(Aggregation):
    """sum_i softmax(t * x)_i * x_i with optionally learnable temperature
    (reference ``basic.py:SoftmaxAggregation``)."""
    t: float = 1.0
    learn: bool = False
    channels: int = 1

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        if self.learn:
            t = self.param('t', lambda k, s: jnp.full(s, self.t),
                           (self.channels,))
        else:
            t = jnp.asarray(self.t)
        alpha = x * t if (self.learn and self.channels > 1) else x * t
        alpha = segment_softmax(alpha, index, dim_size, mask=mask)
        return self.reduce(x * alpha, index, dim_size, 'sum', mask)


class PowerMeanAggregation(Aggregation):
    """(mean(x^p))^(1/p) with optionally learnable p
    (reference ``basic.py:PowerMeanAggregation``)."""
    p: float = 1.0
    learn: bool = False
    channels: int = 1

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        if self.learn:
            p = self.param('p', lambda k, s: jnp.full(s, self.p),
                           (self.channels,))
        else:
            p = jnp.asarray(self.p)
        xp = jnp.power(jnp.clip(x, 0, 100), p)
        out = self.reduce(xp, index, dim_size, 'mean', mask)
        return jnp.power(jnp.clip(out, 1e-12, 100 ** 2), 1.0 / p)


class VariancePreservingAggregation(Aggregation):
    """sum / sqrt(count) (reference ``nn/aggr/variance_preserving.py``)."""

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        total = self.reduce(x, index, dim_size, 'sum', mask)
        ones = jnp.ones((x.shape[0],), x.dtype)
        count = scatter(ones, index, dim_size, 'sum', mask=mask)
        scale = jax.lax.rsqrt(jnp.maximum(count, 1.0))
        return total * scale.reshape((-1,) + (1,) * (total.ndim - 1))
