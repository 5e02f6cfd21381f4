"""Result aggregation across seeds and grid points.

Reference: ``torch_geometric/graphgym/utils/agg_runs.py`` (agg_runs:
mean/std over seeds + best-epoch selection by the validation metric;
agg_batch: one row per grid point, alias=value columns decoded from the
experiment directory name) and the ``graphgym/agg_batch.py`` CLI.

Directory layout consumed (written by our ``graphgym.main``)::

    <exp_dir>/seed_<s>/<split>/stats.json     # one json per line/epoch
"""

import json
import os
import os.path as osp
from typing import Dict, List, Optional

import numpy as np


def _read_stats(path: str) -> List[Dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _agg_dict_list(dict_list: List[Dict], ndigits: int = 4) -> Dict:
    """mean + std per key across seeds (reference ``agg_dict_list``)."""
    agg = {'epoch': dict_list[0].get('epoch', 0)}
    for key in dict_list[0]:
        if key == 'epoch':
            continue
        vals = np.array([float(d[key]) for d in dict_list])
        agg[key] = round(float(vals.mean()), ndigits)
        agg[f'{key}_std'] = round(float(vals.std()), ndigits)
    return agg


def _seed_dirs(exp_dir: str) -> List[str]:
    out = []
    for name in sorted(os.listdir(exp_dir)):
        if name.startswith('seed_') or name.isdigit():
            if osp.isdir(osp.join(exp_dir, name)):
                out.append(osp.join(exp_dir, name))
    return out


def _pick_metric(stats: Dict, metric_best: str) -> str:
    if metric_best != 'auto':
        return metric_best
    return 'auc' if 'auc' in stats else 'accuracy'


def agg_runs(exp_dir: str, metric_best: str = 'auto',
             metric_agg: str = 'argmax') -> Dict[str, Dict]:
    """Aggregate one experiment over its seeds (reference
    ``agg_runs``): per split, (a) mean/std per epoch across seeds into
    ``<exp_dir>/agg/<split>/stats.json``, (b) the best epoch — chosen
    per seed by the VALIDATION metric, then averaged — into
    ``<exp_dir>/agg/<split>/best.json``. Returns {split: best_stats}."""
    per_split: Dict[str, List[List[Dict]]] = {}
    best_rows: Dict[str, List[Dict]] = {}
    for sdir in _seed_dirs(exp_dir):
        splits = [d for d in sorted(os.listdir(sdir))
                  if osp.exists(osp.join(sdir, d, 'stats.json'))]
        # best epoch for this seed: validation metric when present,
        # else train
        sel_split = 'val' if 'val' in splits else (
            'train' if 'train' in splits else None)
        best_idx = None
        if sel_split is not None:
            stats = _read_stats(osp.join(sdir, sel_split, 'stats.json'))
            if stats:
                metric = _pick_metric(stats[0], metric_best)
                perf = np.array([s.get(metric, 0.0) for s in stats])
                best_idx = int(perf.argmax() if metric_agg == 'argmax'
                               else perf.argmin())
        for split in splits:
            stats = _read_stats(osp.join(sdir, split, 'stats.json'))
            if not stats:
                continue
            per_split.setdefault(split, []).append(stats)
            idx = best_idx if best_idx is not None else len(stats) - 1
            best_rows.setdefault(split, []).append(
                stats[min(idx, len(stats) - 1)])

    results = {}
    for split, seed_lists in per_split.items():
        out_dir = osp.join(exp_dir, 'agg', split)
        os.makedirs(out_dir, exist_ok=True)
        n_epochs = min(len(s) for s in seed_lists)
        with open(osp.join(out_dir, 'stats.json'), 'w') as f:
            for ep in range(n_epochs):
                f.write(json.dumps(_agg_dict_list(
                    [s[ep] for s in seed_lists])) + '\n')
        best = _agg_dict_list(best_rows[split])
        with open(osp.join(out_dir, 'best.json'), 'w') as f:
            f.write(json.dumps(best) + '\n')
        results[split] = best
    return results


def _name_to_dict(name: str) -> Dict[str, object]:
    """Decode 'base-a=1-b=x' into {'a': 1, 'b': 'x'} (reference
    ``name_to_dict``)."""
    import ast
    out = {}
    # split on '-' but re-join tokens without '=' into the previous
    # value ('lr=1e-05' / 'd=-3' survive the separator collision)
    cur_k = None
    cur_v = []
    def flush():
        if cur_k is None:
            return
        v = '-'.join(cur_v)
        try:
            out[cur_k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[cur_k] = v
    for part in name.split('-')[1:]:
        if '=' in part:
            flush()
            cur_k, v0 = part.split('=', 1)
            cur_v = [v0]
        elif cur_k is not None:
            cur_v.append(part)
    flush()
    return out


def agg_batch(batch_dir: str, metric_best: str = 'auto',
              metric_agg: str = 'argmax',
              sort_split: str = 'val') -> List[Dict]:
    """Aggregate a directory of grid-point experiments (reference
    ``agg_batch``): one row per experiment (grid aliases decoded from
    the directory name + per-split best metrics), sorted best-first by
    the ``sort_split`` metric; written to
    ``<batch_dir>/agg_batch.{json,csv}``."""
    rows = []
    for name in sorted(os.listdir(batch_dir)):
        exp_dir = osp.join(batch_dir, name)
        if not osp.isdir(exp_dir) or name == 'agg':
            continue
        if not _seed_dirs(exp_dir):
            continue
        best = agg_runs(exp_dir, metric_best, metric_agg)
        row: Dict[str, object] = {'name': name}
        row.update(_name_to_dict(name))
        for split, stats in best.items():
            for k, v in stats.items():
                if k != 'epoch' and not k.endswith('_std'):
                    row[f'{split}_{k}'] = v
        rows.append(row)

    metric = None
    if rows:
        cand = [k for k in rows[0]
                if k.startswith(f'{sort_split}_')
                and k.split('_', 1)[1] in ('auc', 'accuracy')]
        metric = cand[0] if cand else None
    if metric:
        rows.sort(key=lambda r: -float(r.get(metric, 0.0)))
    with open(osp.join(batch_dir, 'agg_batch.json'), 'w') as f:
        json.dump(rows, f, indent=1)
    if rows:
        import csv
        keys = sorted({k for r in rows for k in r},
                      key=lambda k: (k != 'name', k))
        with open(osp.join(batch_dir, 'agg_batch.csv'), 'w',
                  newline='') as f:
            wr = csv.DictWriter(f, fieldnames=keys)
            wr.writeheader()
            wr.writerows(rows)
    return rows


def main():
    import argparse
    ap = argparse.ArgumentParser(description='GraphGym agg_batch')
    ap.add_argument('--dir', required=True)
    ap.add_argument('--metric', default='auto')
    args = ap.parse_args()
    rows = agg_batch(args.dir, args.metric)
    for r in rows[:10]:
        print(json.dumps(r))


if __name__ == '__main__':
    main()
