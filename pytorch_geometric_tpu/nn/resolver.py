"""String -> object resolvers (reference
``torch_geometric/nn/resolver.py``: activation/aggregation/norm/optimizer/
lr_scheduler resolvers) + lr schedulers (``nn/lr_scheduler.py``)."""

from typing import Any, Callable, Optional

import jax
import optax


def activation_resolver(act: Any = 'relu', **kwargs) -> Callable:
    """(reference ``resolver.py:activation_resolver``)."""
    if callable(act):
        return act
    name = act.lower()
    table = {
        'relu': jax.nn.relu, 'elu': jax.nn.elu, 'gelu': jax.nn.gelu,
        'silu': jax.nn.silu, 'swish': jax.nn.silu,
        'sigmoid': jax.nn.sigmoid, 'tanh': jax.nn.tanh,
        'leaky_relu': jax.nn.leaky_relu, 'softplus': jax.nn.softplus,
        'prelu': jax.nn.leaky_relu, 'identity': lambda x: x,
    }
    if name not in table:
        raise ValueError(f"Unknown activation '{act}'")
    return table[name]


def aggregation_resolver(aggr: Any = 'sum', **kwargs):
    from .aggr import aggregation_resolver as _ar
    return _ar(aggr)


def normalization_resolver(norm: Any, in_channels: int = 0, **kwargs):
    """(reference ``resolver.py:normalization_resolver``)."""
    if norm is None or not isinstance(norm, str):
        return norm
    from . import norm as N
    table = {
        'batch_norm': N.BatchNorm, 'instance_norm': N.InstanceNorm,
        'layer_norm': N.LayerNorm, 'graph_norm': N.GraphNorm,
        'graph_size_norm': N.GraphSizeNorm, 'pair_norm': N.PairNorm,
        'mean_subtraction_norm': N.MeanSubtractionNorm,
        'diff_group_norm': N.DiffGroupNorm,
    }
    key = norm.lower()
    if key not in table:
        raise ValueError(f"Unknown normalization '{norm}'")
    return table[key](in_channels=in_channels, **kwargs)


def optimizer_resolver(opt: Any = 'adam', lr: float = 1e-3, **kwargs):
    """(reference ``resolver.py:optimizer_resolver`` -> optax)."""
    if not isinstance(opt, str):
        return opt
    table = {
        'adam': optax.adam, 'adamw': optax.adamw, 'sgd': optax.sgd,
        'rmsprop': optax.rmsprop, 'adagrad': optax.adagrad,
        'adadelta': optax.adadelta, 'lion': optax.lion,
    }
    key = opt.lower()
    if key not in table:
        raise ValueError(f"Unknown optimizer '{opt}'")
    return table[key](lr, **kwargs)


def lr_scheduler_resolver(name: Any, base_lr: float,
                          num_steps: int = 1000,
                          warmup_steps: int = 0, **kwargs):
    """(reference ``nn/lr_scheduler.py`` — constant_with_warmup, linear,
    cosine, polynomial -> optax schedules)."""
    if not isinstance(name, str):
        return name
    key = name.lower()
    if key == 'constant':
        return optax.constant_schedule(base_lr)
    if key == 'constant_with_warmup':
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
             optax.constant_schedule(base_lr)], [warmup_steps])
    if key in ('linear', 'linear_with_warmup'):
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
             optax.linear_schedule(base_lr, 0.0,
                                   max(num_steps - warmup_steps, 1))],
            [warmup_steps])
    if key in ('cosine', 'cosine_with_warmup'):
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup_steps, num_steps)
    if key == 'polynomial':
        return optax.polynomial_schedule(base_lr, 0.0,
                                         kwargs.get('power', 1.0),
                                         num_steps)
    raise ValueError(f"Unknown scheduler '{name}'")
