"""Pytree checkpointing (the core-library analog of the reference's
``torch.save`` checkpoints and ``graphgym/checkpoint.py:16-84``).

Uses orbax when available (async, multi-host safe — the production TPU
path) and falls back to pickled-npz for tiny runs.
"""

import os
import os.path as osp
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _has_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except ImportError:
        return False


def save_checkpoint(path: str, tree: Any, step: Optional[int] = None):
    """Save a pytree (params / opt state / anything jax.tree-mappable).

    With orbax: ``path`` becomes a checkpoint directory (multi-host
    safe). Fallback: a single pickle of numpy-ified leaves.
    """
    if _has_orbax():
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        target = osp.join(path, str(step)) if step is not None else path
        ckptr.save(osp.abspath(target), tree, force=True)
        return target
    os.makedirs(osp.dirname(osp.abspath(path)) or '.', exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {'leaves': [np.asarray(l) for l in leaves],
               'treedef': pickle.dumps(treedef), 'step': step}
    fname = path if path.endswith('.ckpt') else path + '.ckpt'
    with open(fname, 'wb') as f:
        pickle.dump(payload, f)
    return fname


def load_checkpoint(path: str, target: Any = None,
                    step: Optional[int] = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`. ``target``
    (a pytree of the same structure) restores exact array types."""
    if _has_orbax() and osp.isdir(path if step is None
                                  else osp.join(path, str(step))):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        src = osp.join(path, str(step)) if step is not None else path
        return ckptr.restore(osp.abspath(src), item=target)
    fname = path if path.endswith('.ckpt') else path + '.ckpt'
    with open(fname, 'rb') as f:
        payload = pickle.load(f)
    treedef = pickle.loads(payload['treedef'])
    return jax.tree_util.tree_unflatten(treedef, payload['leaves'])


def latest_step(path: str) -> Optional[int]:
    """Newest numeric checkpoint subdirectory under ``path``
    (graphgym auto-resume helper)."""
    if not osp.isdir(path):
        return None
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    return max(steps) if steps else None
