"""GraphGym pluggable trainer: early stopping + best-checkpoint +
LR monitoring via callbacks.

Reference analog: ``graphgym/train.py`` driving
``pytorch_lightning.Trainer`` with callbacks
(``model_builder.py:17-80``).

Run: JAX_PLATFORMS=cpu python examples/graphgym_trainer.py
"""
import jax

jax.config.update('jax_platforms', 'cpu')

from pytorch_geometric_tpu.graphgym import (EarlyStopping,  # noqa: E402
                                            GraphGymDataModule,
                                            GraphGymModule, LRMonitor,
                                            ModelCheckpoint, Trainer,
                                            set_cfg)


def main():
    cfg = set_cfg()
    cfg.out_dir = '/tmp/graphgym_trainer_demo'
    cfg.optim.max_epoch = 40
    cfg.optim.scheduler = 'cos'
    cfg.train.eval_period = 1

    dm = GraphGymDataModule(cfg)
    module = GraphGymModule(dm.dim_in, dm.dim_out, cfg)
    es = EarlyStopping(monitor='val/loss', patience=5)
    ckpt = ModelCheckpoint(period=10, monitor='val/accuracy',
                           mode='max')
    lrmon = LRMonitor()
    trainer = Trainer(callbacks=[es, ckpt, lrmon])
    _, stats = trainer.fit(module, dm)

    print('final stats:', {k: round(v['accuracy'], 3)
                           for k, v in stats.items()})
    if es.stopped_epoch is not None:
        print(f'early-stopped at epoch {es.stopped_epoch} '
              f'(best val loss {es.best:.4f})')
    print(f'best val accuracy ckpt: epoch {ckpt.best_epoch} '
          f'({ckpt.best:.3f})')
    print(f'lr schedule: {lrmon.history[0]:.4f} -> '
          f'{lrmon.history[-1]:.5f}')
    print('test:', {k: round(v, 3)
                    for k, v in trainer.test(module, dm).items()})


if __name__ == '__main__':
    main()
