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


# canonical reference-fidelity aggregation lives in agg.py (mean/std
# across seeds, best-epoch by the validation metric, grid-point table);
# re-exported here for the historical import path.
from .agg import agg_runs, agg_batch  # noqa: F401,E402

# -- run-dir / CLI helpers (reference ``graphgym/config.py:450-520``,
# ``cmd_args.py``, ``init.py``, ``loader.py``, ``logger.py``) -----------

def get_fname(fname: str) -> str:
    """Config-file basename without extension (reference
    ``config.py:get_fname``)."""
    import os.path as _osp
    return _osp.splitext(_osp.basename(fname))[0]


def set_out_dir(out_dir: str, fname: str):
    """Point cfg.out_dir at out_dir/<config-name> (reference
    ``config.py:set_out_dir``)."""
    from .config import cfg
    cfg.out_dir = osp.join(out_dir, get_fname(fname))
    return cfg.out_dir


def set_run_dir(out_dir: str):
    """Point cfg.run_dir at out_dir/<seed> and create it (reference
    ``config.py:set_run_dir``)."""
    import os
    from .config import cfg
    cfg.run_dir = osp.join(out_dir, f'seed_{cfg.seed}')
    os.makedirs(cfg.run_dir, exist_ok=True)
    return cfg.run_dir


def set_printing(run_dir: str = None):
    """Route python logging to stdout + <run_dir>/logging.log (reference
    ``logger.py:set_printing``)."""
    import logging
    import os
    import sys
    handlers = [logging.StreamHandler(sys.stdout)]
    if run_dir:
        os.makedirs(run_dir, exist_ok=True)
        handlers.append(logging.FileHandler(
            osp.join(run_dir, 'logging.log')))
    logging.basicConfig(level=logging.INFO, format='%(message)s',
                        handlers=handlers, force=True)


def dump_cfg(cfg_node=None, out_dir: str = None):
    """Write the active config to <out_dir>/config.yaml (reference
    ``config.py:dump_cfg``)."""
    import os
    from .config import cfg as _cfg
    c = cfg_node if cfg_node is not None else _cfg
    out = out_dir or c.out_dir
    os.makedirs(out, exist_ok=True)
    path = osp.join(out, getattr(c, 'cfg_dest', 'config.yaml'))
    try:
        import yaml
        with open(path, 'w') as f:
            yaml.safe_dump(json.loads(json.dumps(c)), f)
    except ImportError:
        with open(path, 'w') as f:
            json.dump(c, f, indent=1)
    return path


def parse_args(argv=None):
    """GraphGym CLI arguments (reference ``cmd_args.py:parse_args``)."""
    import argparse
    parser = argparse.ArgumentParser(description='GraphGym')
    parser.add_argument('--cfg', dest='cfg_file', type=str, default='',
                        help='Config file path (yaml/json)')
    parser.add_argument('--repeat', type=int, default=1,
                        help='Number of seeds to run')
    parser.add_argument('--mark_done', action='store_true',
                        help='Mark the config done after completion')
    parser.add_argument('opts', nargs='*', default=[],
                        help='Config overrides: key value ...')
    return parser.parse_args(argv)


def init_weights(params, seed: int = 0):
    """Re-initialize a flax params pytree with glorot-uniform kernels and
    zero biases (reference ``init.py:init_weights`` xavier policy).
    Returns a new pytree — flax params are immutable."""
    import jax
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    key = jax.random.PRNGKey(seed)
    out = []
    for path, leaf in flat:
        name = str(path[-1]).lower()
        key, sub = jax.random.split(key)
        if 'kernel' in name and getattr(leaf, 'ndim', 0) >= 2:
            out.append(jax.nn.initializers.glorot_uniform()(
                sub, leaf.shape, leaf.dtype))
        elif 'bias' in name:
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def create_logger(run_dir: str = None):
    """One Logger per split (reference ``logger.py:create_logger``)."""
    from .config import cfg
    from .logger import Logger
    rd = run_dir or cfg.run_dir or cfg.out_dir
    return [Logger(rd, split) for split in ('train', 'val', 'test')]


def create_loader(data=None):
    """Build per-split loaders from cfg (reference
    ``loader.py:create_loader``). Node task -> one full-batch loader per
    split; graph task -> DataLoader over the dataset with cfg batch
    size."""
    from .config import cfg
    from ..datasets import FakeDataset
    from ..loader import DataLoader

    if data is None:
        ds = FakeDataset(num_graphs=cfg.dataset.num_graphs,
                         avg_num_nodes=cfg.dataset.avg_num_nodes,
                         avg_degree=cfg.dataset.avg_degree,
                         num_channels=cfg.dataset.num_channels,
                         num_classes=cfg.dataset.num_classes,
                         task=cfg.dataset.task, seed=cfg.seed)
    else:
        ds = data if isinstance(data, (list, tuple)) else [data]
    if cfg.dataset.task == 'graph':
        n = len(ds)
        s = cfg.dataset.split
        tr, va = int(n * s[0]), int(n * (s[0] + s[1]))
        bs = cfg.train.batch_size
        return [DataLoader([ds[i] for i in range(0, tr)], batch_size=bs,
                           shuffle=True),
                DataLoader([ds[i] for i in range(tr, va)], batch_size=bs),
                DataLoader([ds[i] for i in range(va, n)], batch_size=bs)]
    # node-level: single graph, full batch per split
    return [DataLoader([ds[0]], batch_size=1) for _ in range(3)]
