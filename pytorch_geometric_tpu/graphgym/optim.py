"""Optimizer / scheduler creation from config (reference
``torch_geometric/graphgym/optim.py`` — OptimizerConfig,
create_optimizer, create_scheduler). Optax-native."""

from dataclasses import dataclass

import optax


@dataclass
class OptimizerConfig:
    """(reference ``optim.py:OptimizerConfig``)."""
    optimizer: str = 'adam'
    base_lr: float = 0.01
    weight_decay: float = 5e-4
    momentum: float = 0.9


@dataclass
class SchedulerConfig:
    """(reference ``optim.py:SchedulerConfig``)."""
    scheduler: str = 'cos'
    steps: tuple = (30, 60, 90)
    lr_decay: float = 0.1
    max_epoch: int = 100


def create_scheduler(cfg: SchedulerConfig):
    """LR schedule fn epoch -> multiplier (reference
    ``create_scheduler``)."""
    if cfg.scheduler == 'none':
        return lambda step: 1.0
    if cfg.scheduler == 'step':
        def sched(step):
            import bisect
            return cfg.lr_decay ** bisect.bisect_right(
                list(cfg.steps), step)
        return sched
    if cfg.scheduler == 'cos':
        return optax.cosine_decay_schedule(1.0, cfg.max_epoch)
    raise ValueError(f"Scheduler '{cfg.scheduler}' not supported")


def create_optimizer(cfg: OptimizerConfig,
                     schedule=None) -> optax.GradientTransformation:
    """(reference ``create_optimizer``)."""
    lr = cfg.base_lr if schedule is None else \
        lambda step: cfg.base_lr * schedule(step)
    if cfg.optimizer == 'adam':
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay) \
            if cfg.weight_decay else optax.adam(lr)
    elif cfg.optimizer == 'sgd':
        tx = optax.sgd(lr, momentum=cfg.momentum)
    else:
        raise ValueError(f"Optimizer '{cfg.optimizer}' not supported")
    return tx
