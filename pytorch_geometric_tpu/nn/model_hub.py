"""HuggingFace-Hub checkpoint mixin (reference
``torch_geometric/nn/model_hub.py:21``). Gated on ``huggingface_hub``;
local save/load always works (pickle of the param pytree)."""

import os
import os.path as osp
import pickle
from typing import Any, Optional

import numpy as np

MODEL_FILENAME = 'model_params.pkl'
CONFIG_FILENAME = 'config.json'


class PyGModelHubMixin:
    """Mixin adding ``save_pretrained`` / ``from_pretrained`` to any
    flax model + params pair."""

    @staticmethod
    def save_pretrained(save_directory: str, params: Any,
                        config: Optional[dict] = None,
                        push_to_hub: bool = False,
                        repo_id: Optional[str] = None):
        import jax
        os.makedirs(save_directory, exist_ok=True)
        payload = jax.tree_util.tree_map(np.asarray, params)
        with open(osp.join(save_directory, MODEL_FILENAME), 'wb') as f:
            pickle.dump(payload, f)
        if config is not None:
            import json
            with open(osp.join(save_directory, CONFIG_FILENAME),
                      'w') as f:
                json.dump(config, f)
        if push_to_hub:
            try:
                from huggingface_hub import HfApi
            except ImportError as e:
                raise RuntimeError(
                    'push_to_hub requires huggingface_hub') from e
            api = HfApi()
            api.create_repo(repo_id, exist_ok=True)
            api.upload_folder(folder_path=save_directory,
                              repo_id=repo_id)

    @staticmethod
    def from_pretrained(path_or_repo: str):
        if osp.isdir(path_or_repo):
            d = path_or_repo
        else:
            try:
                from huggingface_hub import snapshot_download
            except ImportError as e:
                raise RuntimeError(
                    'remote from_pretrained requires huggingface_hub'
                ) from e
            d = snapshot_download(path_or_repo)
        with open(osp.join(d, MODEL_FILENAME), 'rb') as f:
            params = pickle.load(f)
        config = None
        cpath = osp.join(d, CONFIG_FILENAME)
        if osp.exists(cpath):
            import json
            with open(cpath) as f:
                config = json.load(f)
        return params, config
