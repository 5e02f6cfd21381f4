from .config import cfg, set_cfg, load_cfg, CfgNode
from .register import register, registry
from .model_builder import create_model
from .train import train
from .logger import Logger
from .checkpoint import save_ckpt, load_ckpt, clean_ckpt
from .utils import configs_gen, agg_runs, agg_batch

__all__ = [
    'OptimizerConfig', 'SchedulerConfig', 'create_optimizer',
    'create_scheduler', 'compute_loss','cfg', 'set_cfg', 'load_cfg', 'CfgNode', 'register',
           'registry', 'create_model', 'train', 'Logger', 'save_ckpt',
           'load_ckpt', 'clean_ckpt', 'configs_gen', 'agg_runs', 'agg_batch']
from .optim import (OptimizerConfig, SchedulerConfig, create_optimizer,
                    create_scheduler)
from .loss import compute_loss
