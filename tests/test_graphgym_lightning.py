"""Pluggable GraphGym trainer (VERDICT r4 missing #4): module /
datamodule / Trainer with early-stopping, checkpoint and LR-monitor
callbacks (reference ``graphgym/model_builder.py:17-80``,
``graphgym/train.py:40``)."""
import glob
import os.path as osp

import numpy as np

from pytorch_geometric_tpu.graphgym import (EarlyStopping,
                                            GraphGymDataModule,
                                            GraphGymModule, LRMonitor,
                                            ModelCheckpoint, Trainer,
                                            lightning_train, set_cfg)


def _cfg(tmp_path, max_epoch=8):
    cfg = set_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.optim.max_epoch = max_epoch
    cfg.optim.scheduler = 'cos'
    cfg.dataset.num_graphs = 1
    cfg.train.eval_period = 1
    return cfg


def test_trainer_fit_and_callbacks(tmp_path):
    cfg = _cfg(tmp_path)
    dm = GraphGymDataModule(cfg)
    module = GraphGymModule(dm.dim_in, dm.dim_out, cfg)
    lrmon = LRMonitor()
    ckpt = ModelCheckpoint(period=2, monitor='val/loss')
    trainer = Trainer(callbacks=[lrmon, ckpt], eval_period=1)
    params, stats = trainer.fit(module, dm)
    assert set(stats) == {'train', 'val', 'test'}
    assert stats['train']['accuracy'] >= 0
    # cosine schedule decays the LR monotonically
    assert len(lrmon.history) == cfg.optim.max_epoch
    assert lrmon.history[-1] < lrmon.history[0]
    # periodic + best checkpoints written
    assert glob.glob(osp.join(trainer.run_dir, 'ckpt', 'epoch_*.pkl'))
    assert glob.glob(osp.join(trainer.run_dir, 'best', 'ckpt',
                              'epoch_*.pkl'))
    assert ckpt.best is not None
    # test() evaluates the fitted params
    m = trainer.test(module, dm)
    assert 0 <= m['accuracy'] <= 1


def test_early_stopping_halts(tmp_path):
    cfg = _cfg(tmp_path, max_epoch=50)
    es = EarlyStopping(monitor='val/loss', patience=2,
                       min_delta=100.0)   # impossible improvement bar
    dm = GraphGymDataModule(cfg)
    module = GraphGymModule(dm.dim_in, dm.dim_out, cfg)
    trainer = Trainer(callbacks=[es], eval_period=1)
    trainer.fit(module, dm)
    assert trainer.should_stop
    assert es.stopped_epoch is not None and es.stopped_epoch < 49


def test_lightning_train_wrapper(tmp_path):
    cfg = _cfg(tmp_path, max_epoch=3)
    params, stats, trainer = lightning_train(cfg)
    assert stats['val']['loss'] > 0
    assert trainer.params is params
