"""GraphGym config system.

Reference: ``torch_geometric/graphgym/config.py:24-444`` (yacs ``cfg``
tree with ~15 groups + CLI/yaml merge). Implemented as a nested
attribute dict (``CfgNode``) with the same group/field names for the
core groups (dataset, model, gnn, train, optim).
"""

import copy
from typing import Any, Dict, Optional


class CfgNode(dict):
    """Attribute-style nested dict (yacs-like)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self) -> 'CfgNode':
        return copy.deepcopy(self)

    def merge_from_dict(self, d: Dict[str, Any]):
        for k, v in d.items():
            if isinstance(v, dict) and isinstance(self.get(k), CfgNode):
                self[k].merge_from_dict(v)
            else:
                self[k] = v

    def merge_from_list(self, opts):
        """['gnn.dim_inner', 64, ...] CLI-style merge
        (reference ``cmd_args.py``)."""
        for key, val in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split('.')
            for p in parts[:-1]:
                node = node[p]
            cur = node.get(parts[-1])
            if isinstance(cur, bool):
                val = str(val).lower() in ('1', 'true', 'yes')
            elif isinstance(cur, int):
                val = int(val)
            elif isinstance(cur, float):
                val = float(val)
            node[parts[-1]] = val


def set_cfg(c: Optional[CfgNode] = None) -> CfgNode:
    """Populate defaults (reference ``config.py:24`` set_cfg)."""
    c = c if c is not None else CfgNode()
    c.out_dir = '/tmp/graphgym_results'
    c.seed = 0
    c.run_dir = ''

    c.dataset = CfgNode(name='fake', task='node', task_type='classification',
                       num_graphs=1, avg_num_nodes=300, avg_degree=8,
                       num_channels=16, num_classes=4, split=[0.8, 0.1, 0.1])
    c.model = CfgNode(type='gnn', loss_fun='cross_entropy',
                     graph_pooling='add')
    c.gnn = CfgNode(layer_type='gcnconv', layers_mp=2, dim_inner=64,
                   act='relu', dropout=0.0, jk=None, heads=1,
                   layers_pre_mp=0, layers_post_mp=1,
                   stage_type='stack', batchnorm=False, l2norm=False)
    c.train = CfgNode(batch_size=32, epochs=10, eval_period=1,
                     ckpt_period=5, enable_ckpt=True)
    c.optim = CfgNode(optimizer='adam', base_lr=0.01, weight_decay=5e-4,
                     max_epoch=10, scheduler='none')
    return c


cfg = set_cfg()


def load_cfg(path: str, opts=None) -> CfgNode:
    """Load yaml + CLI overrides (reference ``config.py:load_cfg``)."""
    import json
    c = set_cfg()
    if path:
        try:
            import yaml
            with open(path) as f:
                c.merge_from_dict(yaml.safe_load(f) or {})
        except ImportError:
            with open(path) as f:
                c.merge_from_dict(json.load(f))
    if opts:
        c.merge_from_list(opts)
    return c
