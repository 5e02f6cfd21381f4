"""Aggregations that materialise a padded per-segment matrix.

Reference: ``torch_geometric/nn/aggr/sort.py`` (SortAggregation),
``nn/aggr/quantile.py`` (Quantile/Median), ``nn/aggr/gru.py`` /
``nn/aggr/lstm.py`` (recurrent), ``nn/aggr/mlp.py``. All require a static
``max_num_elements`` (the reference enforces the same through
``disable_dynamic_shapes``); on TPU the padded ``[B, L, F]`` layout maps
straight onto VPU tiles.
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from .base import Aggregation


class SortAggregation(Aggregation):
    """Sort rows in each segment by last channel (desc), keep ``k``,
    flatten to ``[B, k*F]`` (reference ``nn/aggr/sort.py``)."""
    k: int = 1

    def forward(self, x, index, dim_size, mask, max_num_elements):
        dense, valid = self.to_dense(x, index, dim_size, mask,
                                     max_num_elements)
        key = jnp.where(valid, dense[..., -1], -jnp.inf)
        order = jnp.argsort(-key, axis=1)
        sorted_x = jnp.take_along_axis(dense, order[..., None], axis=1)
        sorted_valid = jnp.take_along_axis(valid, order, axis=1)
        L = dense.shape[1]
        if L >= self.k:
            top = sorted_x[:, :self.k]
            top_valid = sorted_valid[:, :self.k]
        else:
            pad = self.k - L
            top = jnp.pad(sorted_x, ((0, 0), (0, pad), (0, 0)))
            top_valid = jnp.pad(sorted_valid, ((0, 0), (0, pad)))
        top = jnp.where(top_valid[..., None], top, 0)
        return top.reshape(dim_size, self.k * x.shape[-1])


class QuantileAggregation(Aggregation):
    """Per-segment quantile with interpolation
    (reference ``nn/aggr/quantile.py``)."""
    q: float = 0.5
    interpolation: str = 'linear'   # linear|lower|higher|nearest|midpoint

    def forward(self, x, index, dim_size, mask, max_num_elements):
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        dense, valid = self.to_dense(x, index, dim_size, mask,
                                     max_num_elements, fill_value=jnp.inf)
        dense = jnp.where(valid[..., None], dense, jnp.inf)
        sorted_x = jnp.sort(dense, axis=1)
        count = valid.sum(1)
        pos = self.q * jnp.maximum(count - 1, 0).astype(x.dtype)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.ceil(pos).astype(jnp.int32)

        def take(idx):
            return jnp.take_along_axis(sorted_x, idx[:, None, None],
                                       axis=1)[:, 0]

        x_lo = take(lo)
        x_hi = take(hi)
        if self.interpolation == 'lower':
            out = x_lo
        elif self.interpolation == 'higher':
            out = x_hi
        elif self.interpolation == 'nearest':
            out = jnp.where((pos - lo)[:, None] < 0.5, x_lo, x_hi)
        elif self.interpolation == 'midpoint':
            out = 0.5 * (x_lo + x_hi)
        else:  # linear
            frac = (pos - lo.astype(x.dtype))[:, None]
            out = x_lo + frac * (x_hi - x_lo)
        out = jnp.where((count > 0)[:, None], out, 0)
        return out[:, 0] if squeeze else out


class MedianAggregation(QuantileAggregation):
    """q=0.5, lower interpolation (reference ``quantile.py``)."""
    q: float = 0.5
    interpolation: str = 'lower'


class GRUAggregation(Aggregation):
    """GRU over each segment's (insertion-ordered) sequence; returns the
    final hidden state (reference ``nn/aggr/gru.py``)."""
    in_channels: int = 0
    out_channels: int = 0

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        dense, _ = self.to_dense(x, index, dim_size, mask,
                                 max_num_elements)
        cell = fnn.GRUCell(features=self.out_channels or x.shape[-1],
                           name='gru')
        carry = cell.initialize_carry(jnp.zeros((2,), jnp.uint32),
                                      dense[:, 0].shape)
        # Python loop over the (static, small) padded length; flax shares
        # cell params across steps and XLA pipelines the unrolled chain.
        # Reference quirk kept (``gru.py:57``): the GRU also consumes the
        # zero-padded tail positions and the output is the hidden state at
        # the FINAL padded step, so results depend on max_num_elements
        # exactly as in the reference.
        for t in range(dense.shape[1]):
            carry, _ = cell(carry, dense[:, t])
        return carry


class LSTMAggregation(Aggregation):
    """LSTM over each segment's sequence; final hidden state
    (reference ``nn/aggr/lstm.py``)."""
    in_channels: int = 0
    out_channels: int = 0

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        dense, _ = self.to_dense(x, index, dim_size, mask,
                                 max_num_elements)
        cell = fnn.OptimizedLSTMCell(
            features=self.out_channels or x.shape[-1], name='lstm')
        carry = cell.initialize_carry(jnp.zeros((2,), jnp.uint32),
                                      dense[:, 0].shape)
        # Reference quirk kept (``lstm.py:57`` — ``lstm(x)[0][:, -1]``):
        # zero-padded tail steps are processed too.
        for t in range(dense.shape[1]):
            carry, _ = cell(carry, dense[:, t])
        c, h = carry
        return h


class MLPAggregation(Aggregation):
    """Flatten the padded segment matrix and apply an MLP
    (reference ``nn/aggr/mlp.py``). Requires static max_num_elements."""
    out_channels: int = 0
    max_num_elements_static: int = 0

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        L = max_num_elements or self.max_num_elements_static
        if not L:
            raise ValueError('MLPAggregation needs max_num_elements')
        dense, valid = self.to_dense(x, index, dim_size, mask, L)
        flat = (dense * valid[..., None]).reshape(dim_size, -1)
        return fnn.Dense(self.out_channels or x.shape[-1], name='mlp')(flat)
