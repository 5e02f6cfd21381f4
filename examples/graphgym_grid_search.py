"""GraphGym grid search end-to-end (reference workflow:
``graphgym/configs_gen.py`` -> ``main.py`` per config ->
``agg_batch.py``).

Expands a grid file into per-point configs, trains each for a few
epochs over two seeds on FakeDataset, and aggregates everything into a
best-config table (mean +/- std across seeds, best epoch by the
validation metric). The same flow is available as CLIs::

    python -m pytorch_geometric_tpu.graphgym.grid --grid grid.txt --out_dir configs
    python -m pytorch_geometric_tpu.graphgym.main --cfg configs/<point>.json --repeat 2 out_dir results/<point>
    python -m pytorch_geometric_tpu.graphgym.agg --dir results
"""
import json
import os.path as osp
import tempfile

from pytorch_geometric_tpu.graphgym import (agg_batch, grid_configs,
                                            load_cfg, set_cfg, train)

GRID = """\
# key alias values  (reference grid-file format)
gnn.dim_inner d [16,32]
optim.base_lr lr [0.05,0.01]
"""


def main():
    root = tempfile.mkdtemp(prefix='gg_grid_')
    grid_path = osp.join(root, 'grid.txt')
    with open(grid_path, 'w') as f:
        f.write(GRID)

    base = set_cfg()
    base.optim.max_epoch = 3
    base.dataset.avg_num_nodes = 120
    base.dataset.num_channels = 8

    paths = grid_configs(grid_path, base,
                         out_dir=osp.join(root, 'configs'))
    print(f'{len(paths)} grid points')

    results_dir = osp.join(root, 'results')
    for p in paths:
        cfg = load_cfg(p)
        name = osp.basename(p)[:-len('.json')]
        for seed in (0, 1):
            run = cfg.clone()
            run.seed = seed
            train(run, run_dir=osp.join(results_dir, name,
                                        f'seed_{seed}'))

    rows = agg_batch(results_dir)            # best-config table
    print(f"{'point':<28} {'d':>4} {'lr':>6} {'val acc':>8}")
    for r in rows:
        print(f"{r['name'][5:]:<28} {r['d']:>4} {r['lr']:>6} "
              f"{r.get('val_accuracy', 0.0):>8.3f}")
    print('artifacts:', osp.join(results_dir, 'agg_batch.csv'))


if __name__ == '__main__':
    main()
