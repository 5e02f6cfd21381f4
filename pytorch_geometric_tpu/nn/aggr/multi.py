"""MultiAggregation + DegreeScalerAggregation.

Reference: ``torch_geometric/nn/aggr/multi.py:14`` and
``nn/aggr/scaler.py:11`` (the PNA scaler). The reference's
``FusedAggregation`` (``fused.py:20``) exists to share intermediates
across aggregators on GPU; under XLA the shared gathers/segment sums are
fused automatically, so plain composition is already "fused".
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as fnn
import jax.numpy as jnp

from .base import Aggregation
from .basic import (SumAggregation, MeanAggregation, MaxAggregation,
                    MinAggregation, MulAggregation, VarAggregation,
                    StdAggregation, SoftmaxAggregation,
                    PowerMeanAggregation, VariancePreservingAggregation)
from ...ops import scatter

_STR_AGGRS = {
    'sum': SumAggregation, 'add': SumAggregation, 'mean': MeanAggregation,
    'max': MaxAggregation, 'min': MinAggregation, 'mul': MulAggregation,
    'var': VarAggregation, 'std': StdAggregation,
    'softmax': SoftmaxAggregation, 'powermean': PowerMeanAggregation,
    'variance_preserving': VariancePreservingAggregation,
}


def aggregation_resolver(aggr) -> Aggregation:
    """str | Aggregation | list -> Aggregation module (reference
    ``nn/resolver.py`` aggr resolver)."""
    if isinstance(aggr, Aggregation):
        return aggr
    if isinstance(aggr, (list, tuple)):
        return MultiAggregation(aggrs=tuple(aggr))
    if isinstance(aggr, str):
        key = aggr.lower()
        if key not in _STR_AGGRS:
            raise ValueError(f"Unknown aggregation '{aggr}' "
                             f"(choose from {sorted(_STR_AGGRS)})")
        return _STR_AGGRS[key]()
    raise TypeError(f'Cannot resolve aggregation from {type(aggr)}')


class MultiAggregation(Aggregation):
    """Run several aggregations and combine (reference ``multi.py:14``).

    ``mode``: 'cat' | 'proj' | 'sum' | 'mean' | 'max' | 'min'.
    'proj' needs ``out_channels``.
    """
    aggrs: Sequence[Any] = ('mean', 'max')
    mode: str = 'cat'
    out_channels: Optional[int] = None

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        outs = [aggregation_resolver(a)(x, index, dim_size, mask,
                                        max_num_elements)
                for a in self.aggrs]
        if self.mode == 'cat':
            return jnp.concatenate(outs, axis=-1)
        if self.mode == 'proj':
            out = jnp.concatenate(outs, axis=-1)
            return fnn.Dense(self.out_channels or x.shape[-1],
                             name='proj')(out)
        stack = jnp.stack(outs, axis=0)
        if self.mode in ('sum', 'add'):
            return stack.sum(0)
        if self.mode == 'mean':
            return stack.mean(0)
        if self.mode == 'max':
            return stack.max(0)
        if self.mode == 'min':
            return stack.min(0)
        raise ValueError(f"Unknown combine mode '{self.mode}'")


class DegreeScalerAggregation(Aggregation):
    """PNA: aggregations x degree scalers (reference ``scaler.py:11``).

    ``avg_deg_log`` is the dataset statistic E[log(deg+1)] the reference
    computes from ``deg`` histograms (``nn/conv/pna_conv.py``).
    """
    aggr: Any = ('mean', 'min', 'max', 'std')
    scaler: Sequence[str] = ('identity', 'amplification', 'attenuation')
    avg_deg_log: float = 1.0
    avg_deg_lin: float = 1.0
    train_norm: bool = False

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        out = aggregation_resolver(
            self.aggr if not isinstance(self.aggr, (list, tuple))
            else MultiAggregation(aggrs=tuple(self.aggr)))(
                x, index, dim_size, mask, max_num_elements)
        ones = jnp.ones((x.shape[0],), x.dtype)
        deg = scatter(ones, index, dim_size, 'sum', mask=mask)
        log_deg = jnp.log(deg + 1)[:, None]
        avg = self.avg_deg_log
        outs = []
        for s in self.scaler:
            if s == 'identity':
                outs.append(out)
            elif s == 'amplification':
                outs.append(out * (log_deg / avg))
            elif s == 'attenuation':
                # reference scaler.py:164: avg / log(clamp(deg,1)+1)
                outs.append(out * (avg / jnp.log(
                    jnp.maximum(deg, 1.0) + 1)[:, None]))
            elif s == 'linear':
                outs.append(out * (deg[:, None] / self.avg_deg_lin))
            elif s == 'inverse_linear':
                outs.append(out * (self.avg_deg_lin
                                   / jnp.maximum(deg[:, None], 1.0)))
            else:
                raise ValueError(f"Unknown scaler '{s}'")
        return jnp.concatenate(outs, axis=-1)
