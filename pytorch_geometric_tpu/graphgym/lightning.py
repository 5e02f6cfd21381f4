"""Pluggable GraphGym trainer: module / datamodule / callbacks.

Reference: ``torch_geometric/graphgym/model_builder.py:17-80``
(``GraphGymModule`` — a LightningModule bundling model + optimizer
config + shared step) and ``graphgym/loader.py`` (``GraphGymDataModule``);
the reference's ``train()`` delegates to ``pytorch_lightning.Trainer``
with checkpoint/LR-monitor callbacks (``graphgym/train.py:40``).

JAX redesign: the module is FUNCTIONAL — it owns the flax model and
pure ``loss/metric`` functions; the Trainer drives a jitted epoch loop
and calls user callbacks (early stopping, checkpointing, custom
logging) on host at epoch boundaries, which is exactly where Lightning
hooks fire. The built-in ``graphgym.train()`` remains the minimal
no-callback loop; this is the extensible surface.
"""

import os.path as osp
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .checkpoint import load_ckpt, save_ckpt
from .config import CfgNode
from .logger import Logger
from .model_builder import create_model

__all__ = ['GraphGymModule', 'GraphGymDataModule', 'Callback',
           'EarlyStopping', 'ModelCheckpoint', 'LRMonitor', 'Trainer',
           'lightning_train']


class GraphGymModule:
    """Model + optimizer + loss in one unit (reference
    ``model_builder.py:17``)."""

    def __init__(self, dim_in: int, dim_out: int, cfg: CfgNode):
        self.cfg = cfg
        self.model = create_model(cfg)
        self.dim_in, self.dim_out = dim_in, dim_out

    def init(self, rng, x, edge_index):
        return self.model.init(rng, x, edge_index)

    def forward(self, params, x, edge_index):
        return self.model.apply(params, x, edge_index)

    __call__ = forward

    def configure_optimizers(self):
        """(tx, schedule) from ``cfg.optim`` (reference
        ``configure_optimizers``, ``model_builder.py:27-30``)."""
        from .optim import (OptimizerConfig, SchedulerConfig,
                            create_optimizer, create_scheduler)
        o = self.cfg.optim
        ocfg = OptimizerConfig(
            optimizer=o.optimizer, base_lr=o.base_lr,
            weight_decay=o.weight_decay, momentum=o.momentum)
        scfg = SchedulerConfig(
            scheduler=o.scheduler, steps=tuple(o.steps),
            lr_decay=o.lr_decay, max_epoch=o.max_epoch)
        sched = create_scheduler(scfg)
        return create_optimizer(ocfg, sched), sched

    def loss(self, params, x, edge_index, y, mask):
        """Masked cross-entropy shared step (reference
        ``_shared_step``, ``model_builder.py:32``)."""
        logits = self.forward(params, x, edge_index)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, y)
        return jnp.where(mask, losses, 0).sum() / jnp.maximum(
            mask.sum(), 1)

    def metrics(self, params, x, edge_index, y, mask):
        logits = self.forward(params, x, edge_index)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, y)
        denom = jnp.maximum(mask.sum(), 1)
        loss = jnp.where(mask, losses, 0).sum() / denom
        acc = jnp.where(mask, logits.argmax(-1) == y,
                        False).sum() / denom
        return {'loss': loss, 'accuracy': acc}


class GraphGymDataModule:
    """cfg -> device arrays + split masks (reference
    ``graphgym/loader.py::GraphGymDataModule``)."""

    def __init__(self, cfg: CfgNode, data=None):
        self.cfg = cfg
        if data is None:
            from .train import _make_data
            data = _make_data(cfg)
        self.data = data
        n = data.num_nodes
        rng = np.random.default_rng(cfg.seed)
        perm = rng.permutation(n)
        s = cfg.dataset.split
        tr, va = int(n * s[0]), int(n * (s[0] + s[1]))
        self.masks = {}
        for name, sl in (('train', perm[:tr]), ('val', perm[tr:va]),
                         ('test', perm[va:])):
            m = np.zeros(n, bool)
            m[sl] = True
            self.masks[name] = jnp.asarray(m)
        self.x = jnp.asarray(np.asarray(data.x))
        ei = data.edge_index
        self.edge_index = jnp.asarray(np.asarray(
            ei.coo if hasattr(ei, 'coo') else ei))
        self.y = jnp.asarray(np.asarray(data.y))

    @property
    def dim_in(self) -> int:
        return int(self.x.shape[-1])

    @property
    def dim_out(self) -> int:
        return int(np.asarray(self.y).max()) + 1


class Callback:
    """Epoch-boundary hooks (the Lightning callback protocol subset
    that is meaningful for a jitted loop)."""

    def on_fit_start(self, trainer, module):
        pass

    def on_epoch_end(self, trainer, module, epoch: int,
                     stats: Dict[str, Dict[str, float]]):
        pass

    def on_fit_end(self, trainer, module):
        pass


class EarlyStopping(Callback):
    """Stop when ``monitor`` stops improving (the Lightning
    ``EarlyStopping`` the reference trainer accepts via
    ``callbacks=``)."""

    def __init__(self, monitor: str = 'val/loss', patience: int = 5,
                 mode: str = 'min', min_delta: float = 0.0):
        assert mode in ('min', 'max')
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.wait = 0
        self.stopped_epoch: Optional[int] = None

    def _value(self, stats):
        split, key = self.monitor.split('/')
        return float(stats[split][key])

    def on_epoch_end(self, trainer, module, epoch, stats):
        if not stats:
            return
        cur = self._value(stats)
        better = (self.best is None
                  or (self.mode == 'min'
                      and cur < self.best - self.min_delta)
                  or (self.mode == 'max'
                      and cur > self.best + self.min_delta))
        if better:
            self.best, self.wait = cur, 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                trainer.should_stop = True
                self.stopped_epoch = epoch


class ModelCheckpoint(Callback):
    """Periodic and/or best-``monitor`` checkpointing (the reference
    trainer's ``ModelCheckpoint`` callback + ``graphgym/checkpoint.py``
    format, so auto-resume keeps working)."""

    def __init__(self, period: int = 0, monitor: Optional[str] = None,
                 mode: str = 'min'):
        self.period = period
        self.monitor = monitor
        self.mode = mode
        self.best: Optional[float] = None
        self.best_epoch: Optional[int] = None

    def on_epoch_end(self, trainer, module, epoch, stats):
        if self.period and (epoch + 1) % self.period == 0:
            save_ckpt(trainer.run_dir, epoch, trainer.params,
                      trainer.opt_state)
        if self.monitor is not None and stats:
            split, key = self.monitor.split('/')
            cur = float(stats[split][key])
            better = (self.best is None
                      or (self.mode == 'min' and cur < self.best)
                      or (self.mode == 'max' and cur > self.best))
            if better:
                self.best, self.best_epoch = cur, epoch
                # best checkpoint lives in its own subdir so the
                # auto-resume glob over run_dir picks the LATEST epoch
                save_ckpt(osp.join(trainer.run_dir, 'best'), epoch,
                          trainer.params, trainer.opt_state,
                          extra={'monitor': self.monitor,
                                 'value': cur})


class LRMonitor(Callback):
    """Record the scheduled learning rate per epoch (the reference's
    ``LearningRateMonitor``)."""

    def __init__(self):
        self.history: List[float] = []

    def on_epoch_end(self, trainer, module, epoch, stats):
        mult = trainer.schedule(epoch) if trainer.schedule else 1.0
        self.history.append(
            float(module.cfg.optim.base_lr) * float(mult))


class Trainer:
    """Epoch-loop driver with callbacks (the
    ``pytorch_lightning.Trainer`` role in reference
    ``graphgym/train.py:40-77``)."""

    def __init__(self, max_epochs: Optional[int] = None,
                 callbacks: Optional[List[Callback]] = None,
                 eval_period: int = 1, enable_ckpt: bool = False,
                 run_dir: Optional[str] = None):
        self.max_epochs = max_epochs
        self.callbacks = list(callbacks or [])
        self.eval_period = eval_period
        self.enable_ckpt = enable_ckpt
        self.run_dir = run_dir
        self.should_stop = False
        self.params = None
        self.opt_state = None
        self.schedule = None
        self.loggers: Dict[str, Logger] = {}

    def fit(self, module: GraphGymModule, dm: GraphGymDataModule):
        cfg = module.cfg
        max_epochs = self.max_epochs or cfg.optim.max_epoch
        self.run_dir = self.run_dir or osp.join(cfg.out_dir,
                                                f'seed_{cfg.seed}')
        x, ei, y = dm.x, dm.edge_index, dm.y
        self.params = module.init(jax.random.PRNGKey(cfg.seed), x, ei)
        tx, self.schedule = module.configure_optimizers()
        self.opt_state = tx.init(self.params)

        start_epoch = 0
        if self.enable_ckpt:
            ck = load_ckpt(self.run_dir)
            if ck is not None:
                self.params = jax.tree_util.tree_map(
                    jnp.asarray, ck['params'])
                if ck['opt_state'] is not None:
                    self.opt_state = jax.tree_util.tree_map(
                        jnp.asarray, ck['opt_state'])
                start_epoch = ck['epoch'] + 1

        @jax.jit
        def train_step(params, opt_state, mask):
            loss, grads = jax.value_and_grad(module.loss)(
                params, x, ei, y, mask)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        metrics = jax.jit(module.metrics)

        self.loggers = {k: Logger(self.run_dir, k) for k in dm.masks}
        for cb in self.callbacks:
            cb.on_fit_start(self, module)
        stats: Dict[str, Dict[str, float]] = {}
        for epoch in range(start_epoch, max_epochs):
            self.params, self.opt_state, _ = train_step(
                self.params, self.opt_state, dm.masks['train'])
            stats = {}
            if (epoch + 1) % self.eval_period == 0:
                for split, mask in dm.masks.items():
                    m = metrics(self.params, x, ei, y, mask)
                    stats[split] = {k: float(v) for k, v in m.items()}
                    self.loggers[split].update_stats(
                        None, None, stats[split]['loss'],
                        int(mask.sum()))
                    self.loggers[split]._correct = int(
                        stats[split]['accuracy'] * int(mask.sum()))
                    self.loggers[split].write_epoch(epoch)
            for cb in self.callbacks:
                cb.on_epoch_end(self, module, epoch, stats)
            if self.should_stop:
                break
        for cb in self.callbacks:
            cb.on_fit_end(self, module)
        return self.params, stats

    def test(self, module: GraphGymModule, dm: GraphGymDataModule
             ) -> Dict[str, float]:
        m = module.metrics(self.params, dm.x, dm.edge_index, dm.y,
                           dm.masks['test'])
        return {k: float(v) for k, v in m.items()}


def lightning_train(cfg: CfgNode, data=None,
                    callbacks: Optional[List[Callback]] = None,
                    run_dir: Optional[str] = None):
    """Reference ``graphgym/train.py::train`` signature over the
    pluggable Trainer (module + datamodule assembled from cfg)."""
    dm = GraphGymDataModule(cfg, data)
    module = GraphGymModule(dm.dim_in, dm.dim_out, cfg)
    trainer = Trainer(callbacks=callbacks,
                      eval_period=cfg.train.eval_period,
                      enable_ckpt=cfg.train.enable_ckpt,
                      run_dir=run_dir)
    params, stats = trainer.fit(module, dm)
    return params, stats, trainer
