"""Framework cache/home directory (reference ``torch_geometric/home.py``).

Datasets and model-hub artifacts default their ``root`` here when the
user passes none. Resolution order: ``set_home_dir()`` >
``$PGT_HOME`` > ``~/.cache/pytorch_geometric_tpu``.
"""

import os
import os.path as osp
from typing import Optional

ENV_PGT_HOME = 'PGT_HOME'
DEFAULT_CACHE_DIR = osp.join('~', '.cache', 'pytorch_geometric_tpu')

_home_dir: Optional[str] = None


def get_home_dir() -> str:
    """Returns the cache directory for storing datasets and models."""
    if _home_dir is not None:
        return _home_dir
    return osp.expanduser(os.getenv(ENV_PGT_HOME, DEFAULT_CACHE_DIR))


def set_home_dir(path: str) -> None:
    """Sets the cache directory used by datasets and the model hub."""
    global _home_dir
    _home_dir = path
