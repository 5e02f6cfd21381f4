"""Grid-search config generation (reference
``/root/reference/graphgym/configs_gen.py`` + its grid-file format).

A grid file has one dimension per line::

    # comments and blank lines skipped
    gnn.layers_mp l_mp [2,4]
    optim.base_lr lr [0.01,0.1]

Fields: config key, short alias (used in generated experiment names),
python-literal list of values. ``grid_configs`` expands the full cross
product (``configs_gen.py::grid2list``); ``sample_num`` draws a random
subset instead (``grid2list_sample``). Generated configs are written as
one yaml/json per point under ``out_dir``, named
``<base>-<alias>=<val>-...`` — the same name-encodes-the-point scheme
``agg_batch`` decodes back into a table.
"""

import ast
import itertools
import json
import os
import os.path as osp
import random
from typing import Dict, List, Optional, Tuple

from .config import CfgNode, set_cfg


def load_grid(path: str) -> List[Tuple[str, str, list]]:
    """Parse a reference-format grid file into
    [(key, alias, values), ...]."""
    dims = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            key, alias, vals = line.split(' ', 2)
            dims.append((key, alias, ast.literal_eval(vals)))
    return dims


def grid_points(dims: List[Tuple[str, str, list]],
                sample_num: Optional[int] = None,
                seed: int = 123) -> List[Dict[str, object]]:
    """Cross product (or random sample) of the grid as
    [{key: value}, ...] (reference ``grid2list``/``grid2list_sample``)."""
    keys = [d[0] for d in dims]
    # dedupe value lists: duplicates would make the sample loop's
    # distinct-tuple target unreachable (infinite loop)
    spaces = [list(dict.fromkeys(d[2])) for d in dims]
    if sample_num is None:
        combos = list(itertools.product(*spaces))
    else:
        rng = random.Random(seed)
        seen = []
        while len(seen) < min(sample_num,
                              int__prod(len(s) for s in spaces)):
            c = tuple(rng.choice(s) for s in spaces)
            if c not in seen:
                seen.append(c)
        combos = seen
    return [dict(zip(keys, c)) for c in combos]


def int__prod(it):
    p = 1
    for v in it:
        p *= v
    return p


def point_name(base: str, dims, point: Dict[str, object]) -> str:
    """<base>-<alias>=<val>-... (decodable by agg_batch)."""
    parts = [base]
    for key, alias, _ in dims:
        parts.append(f'{alias}={point[key]}')
    return '-'.join(parts)


def grid_configs(grid_path: str, base_cfg: Optional[CfgNode] = None,
                 out_dir: str = 'configs', base_name: str = 'grid',
                 sample_num: Optional[int] = None) -> List[str]:
    """Expand a grid file into per-point config files; returns the
    written paths (reference ``configs_gen.py::main``)."""
    dims = load_grid(grid_path)
    base = base_cfg.clone() if base_cfg is not None else set_cfg()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for point in grid_points(dims, sample_num):
        c = base.clone()
        for key, val in point.items():
            node = c
            ks = key.split('.')
            for k in ks[:-1]:
                node = node[k]
            if ks[-1] not in node:
                raise KeyError(f"grid key '{key}' is not a config field")
            node[ks[-1]] = val
        name = point_name(base_name, dims, point)
        path = osp.join(out_dir, name + '.json')
        with open(path, 'w') as f:
            json.dump(c, f, indent=1)
        paths.append(path)
    return paths


def main():
    import argparse
    from .config import load_cfg
    ap = argparse.ArgumentParser(description='GraphGym configs_gen')
    ap.add_argument('--config', default=None,
                    help='base config the grid edits')
    ap.add_argument('--grid', required=True)
    ap.add_argument('--sample_num', type=int, default=None)
    ap.add_argument('--out_dir', default='configs')
    args = ap.parse_args()
    base = load_cfg(args.config) if args.config else None
    base_name = (osp.basename(args.grid).rsplit('.', 1)[0]
                 if args.grid else 'grid')
    paths = grid_configs(args.grid, base, args.out_dir, base_name,
                         args.sample_num)
    print(f'generated {len(paths)} configs under {args.out_dir}')


if __name__ == '__main__':
    main()
