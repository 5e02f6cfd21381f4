from .config import cfg, set_cfg, load_cfg, CfgNode
from .register import (register, registry, register_base, register_act,
                       register_node_encoder, register_edge_encoder,
                       register_stage, register_head, register_layer,
                       register_pooling, register_network,
                       register_config, register_dataset,
                       register_loader, register_optimizer,
                       register_scheduler, register_loss,
                       register_train, register_metric)
from .model_builder import create_model
from .train import train
from .lightning import (GraphGymModule, GraphGymDataModule, Callback,
                        EarlyStopping, ModelCheckpoint, LRMonitor,
                        Trainer, lightning_train)
from .logger import Logger
from .checkpoint import save_ckpt, load_ckpt, clean_ckpt, remove_ckpt
from .grid import load_grid, grid_points, grid_configs
from .utils import (configs_gen, agg_runs, agg_batch, get_fname,
                    set_out_dir, set_run_dir, set_printing, dump_cfg,
                    parse_args, init_weights, create_logger,
                    create_loader)

__all__ = [
    'OptimizerConfig', 'SchedulerConfig', 'create_optimizer',
    'create_scheduler', 'compute_loss', 'cfg', 'set_cfg', 'load_cfg',
    'CfgNode', 'register', 'registry', 'register_base', 'register_act',
    'register_node_encoder', 'register_edge_encoder', 'register_stage',
    'register_head', 'register_layer', 'register_pooling',
    'register_network', 'register_config', 'register_dataset',
    'register_loader', 'register_optimizer', 'register_scheduler',
    'register_loss', 'register_train', 'register_metric',
    'create_model', 'train', 'Logger', 'save_ckpt', 'load_ckpt',
    'GraphGymModule', 'GraphGymDataModule', 'Callback', 'EarlyStopping',
    'ModelCheckpoint', 'LRMonitor', 'Trainer', 'lightning_train',
    'clean_ckpt', 'remove_ckpt', 'configs_gen', 'agg_runs', 'agg_batch',
    'load_grid', 'grid_points', 'grid_configs',
    'get_fname', 'set_out_dir', 'set_run_dir', 'set_printing',
    'dump_cfg', 'parse_args', 'init_weights', 'create_logger',
    'create_loader']
from .optim import (OptimizerConfig, SchedulerConfig, create_optimizer,
                    create_scheduler)
from .loss import compute_loss
from .encoder import (IntegerFeatureEncoder, AtomEncoder, BondEncoder,
                      OGB_ATOM_FEATURE_DIMS, OGB_BOND_FEATURE_DIMS)
