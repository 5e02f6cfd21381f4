"""GraphGym grid tooling (VERDICT r3 #5): full cfg field set, strict
merge, grid-file expansion (configs_gen), seed aggregation (agg_runs),
grid aggregation to a best-config table (agg_batch)."""
import json
import os.path as osp

import numpy as np
import pytest

from pytorch_geometric_tpu.graphgym import (set_cfg, load_cfg, train,
                                            load_grid, grid_points,
                                            grid_configs, agg_runs,
                                            agg_batch)
from pytorch_geometric_tpu.graphgym.grid import point_name


def test_full_cfg_groups_present():
    c = set_cfg()
    # every reference group (config.py:24-444)
    for grp in ('share', 'dataset', 'train', 'val', 'model', 'gnn',
                'optim', 'bn', 'mem'):
        assert grp in c, grp
    # spot fields per group
    assert c.share.num_splits == 1
    assert c.val.sampler == 'full_batch'
    assert c.bn.eps == 1e-5
    assert c.mem.inplace is False
    assert c.train.neighbor_sizes == [20, 15, 10, 5]
    assert c.dataset.edge_negative_sampling_ratio == 1.0
    assert c.gnn.self_msg == 'concat'
    assert c.metric_agg == 'argmax'


def test_strict_merge_rejects_unknown_keys(tmp_path):
    c = set_cfg()
    with pytest.raises(KeyError, match='unknown config key'):
        c.merge_from_dict({'gnn': {'dim_innr': 8}})
    with pytest.raises(KeyError, match='unknown config key'):
        c.merge_from_list(['optim.base_lrr', '0.1'])
    # yaml path raises too
    p = tmp_path / 'bad.json'
    p.write_text(json.dumps({'trian': {'batch_size': 4}}))
    with pytest.raises(KeyError):
        load_cfg(str(p))


def test_register_config_escape_hatch():
    from pytorch_geometric_tpu.graphgym import register_config
    from pytorch_geometric_tpu.graphgym.register import registry

    @register_config('my_extra')
    def _extra(c):
        c.my_group = type(c)(knob=3)

    try:
        c = set_cfg()
        assert c.my_group.knob == 3
        c.merge_from_dict({'my_group': {'knob': 5}})
        assert c.my_group.knob == 5
    finally:
        registry['config'].pop('my_extra')


def test_grid_file_expansion(tmp_path):
    grid = tmp_path / 'grid.txt'
    grid.write_text(
        '# comment line\n'
        'gnn.dim_inner d [8,16]\n'
        "optim.base_lr lr [0.01,0.1]\n")
    dims = load_grid(str(grid))
    assert [d[0] for d in dims] == ['gnn.dim_inner', 'optim.base_lr']
    pts = grid_points(dims)
    assert len(pts) == 4
    paths = grid_configs(str(grid), out_dir=str(tmp_path / 'configs'))
    assert len(paths) == 4
    names = {osp.basename(p) for p in paths}
    assert 'grid-d=8-lr=0.01.json' in names
    # generated configs load and carry the point values
    c = load_cfg(sorted(paths)[0])
    assert c.gnn.dim_inner in (8, 16)
    # unknown grid key fails loudly
    bad = tmp_path / 'bad.txt'
    bad.write_text('gnn.dim_innr d [8]\n')
    with pytest.raises(KeyError):
        grid_configs(str(bad), out_dir=str(tmp_path / 'x'))


def test_grid_sample_subset(tmp_path):
    grid = tmp_path / 'grid.txt'
    grid.write_text('gnn.dim_inner d [8,16,32,64]\n'
                    'gnn.layers_mp l [1,2,3]\n')
    pts = grid_points(load_grid(str(grid)), sample_num=5)
    assert len(pts) == 5
    assert len({tuple(sorted(p.items())) for p in pts}) == 5


def test_grid_runs_and_aggregates_to_best_table(tmp_path):
    """The VERDICT r3 #5 done-criterion: generate a 2x2 grid, run 2
    seeds each on FakeDataset, aggregate to a best-config table."""
    grid = tmp_path / 'grid.txt'
    grid.write_text('gnn.dim_inner d [8,16]\n'
                    'optim.base_lr lr [0.05,0.01]\n')
    base = set_cfg()
    base.optim.max_epoch = 2
    base.dataset.avg_num_nodes = 60
    base.dataset.num_channels = 8
    paths = grid_configs(str(grid), base,
                         out_dir=str(tmp_path / 'configs'))
    batch_dir = tmp_path / 'results'
    for p in paths:
        c = load_cfg(p)
        name = osp.basename(p)[:-len('.json')]
        for seed in (0, 1):
            rc = c.clone()
            rc.seed = seed
            train(rc, run_dir=str(batch_dir / name / f'seed_{seed}'))

    # per-experiment seed aggregation: mean/std per epoch + best row
    one = agg_runs(str(batch_dir / osp.basename(paths[0])[:-5]))
    assert 'train' in one
    assert 'accuracy' in one['train'] and 'accuracy_std' in one['train']

    rows = agg_batch(str(batch_dir))
    assert len(rows) == 4
    # grid aliases decoded back into columns
    assert {r['d'] for r in rows} == {8, 16}
    assert {r['lr'] for r in rows} == {0.05, 0.01}
    assert all('train_accuracy' in r for r in rows)
    # artifacts written
    assert (batch_dir / 'agg_batch.json').exists()
    assert (batch_dir / 'agg_batch.csv').exists()
    agg_stats = (batch_dir / osp.basename(paths[0])[:-5] / 'agg'
                 / 'train' / 'stats.json')
    assert agg_stats.exists()
    assert len(agg_stats.read_text().strip().splitlines()) == 2
