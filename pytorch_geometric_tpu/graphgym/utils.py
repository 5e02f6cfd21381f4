"""GraphGym grid search + aggregation (reference
``graphgym/configs_gen.py`` and ``graphgym/utils/agg_runs.py`` /
``agg_batch.py``)."""

import glob
import itertools
import json
import os.path as osp
from typing import Dict, List, Sequence

import numpy as np

from .config import CfgNode


def configs_gen(base_cfg: CfgNode, grid: Dict[str, Sequence]
                ) -> List[CfgNode]:
    """Cartesian grid of override values -> list of configs
    (reference ``configs_gen.py``)."""
    keys = list(grid.keys())
    out = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        c = base_cfg.clone()
        opts = []
        for k, v in zip(keys, combo):
            opts += [k, v]
        c.merge_from_list(opts)
        c.grid_id = '-'.join(f'{k}={v}' for k, v in zip(keys, combo))
        out.append(c)
    return out


def agg_runs(out_dir: str, metric: str = 'accuracy',
             split: str = 'val') -> Dict[str, Dict[str, float]]:
    """Aggregate stats.json across seeds (reference ``agg_runs.py``):
    returns {run: {mean, std, best_epoch}}."""
    results = {}
    for run_dir in sorted(glob.glob(osp.join(out_dir, '*'))):
        stats_file = osp.join(run_dir, split, 'stats.json')
        if not osp.exists(stats_file):
            continue
        vals = []
        with open(stats_file) as f:
            for line in f:
                row = json.loads(line)
                vals.append((row['epoch'], row.get(metric, 0.0)))
        if not vals:
            continue
        arr = np.array([v for _, v in vals])
        best = int(np.argmax(arr))
        results[osp.basename(run_dir)] = {
            'mean': float(arr.mean()),
            'final': float(arr[-1]),
            'best': float(arr[best]),
            'best_epoch': vals[best][0],
        }
    return results


def agg_batch(out_dir: str, metric: str = 'accuracy',
              split: str = 'val') -> Dict[str, float]:
    """Mean of the final metric across all runs (reference
    ``agg_batch.py``)."""
    per_run = agg_runs(out_dir, metric, split)
    if not per_run:
        return {}
    finals = [v['final'] for v in per_run.values()]
    return {'mean': float(np.mean(finals)),
            'std': float(np.std(finals)),
            'num_runs': len(finals)}
