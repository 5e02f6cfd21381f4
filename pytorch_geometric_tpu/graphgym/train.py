"""GraphGym training loop (reference
``torch_geometric/graphgym/train.py:40`` — Lightning-based; here a plain
jitted loop with auto-resume from the newest checkpoint)."""

import os.path as osp
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import save_ckpt, load_ckpt
from .config import CfgNode
from .logger import Logger
from .model_builder import create_model


def _make_data(cfg: CfgNode):
    from ..datasets import FakeDataset
    ds = FakeDataset(num_graphs=cfg.dataset.num_graphs,
                     avg_num_nodes=cfg.dataset.avg_num_nodes,
                     avg_degree=cfg.dataset.avg_degree,
                     num_channels=cfg.dataset.num_channels,
                     num_classes=cfg.dataset.num_classes,
                     task=cfg.dataset.task, seed=cfg.seed)
    return ds[0]


def train(cfg: CfgNode, data=None, run_dir: Optional[str] = None):
    """Config-driven node-classification training with checkpoints +
    loggers. Returns (params, {split: stats})."""
    run_dir = run_dir or osp.join(cfg.out_dir, f'seed_{cfg.seed}')
    data = data if data is not None else _make_data(cfg)
    n = data.num_nodes
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(n)
    s = cfg.dataset.split
    tr = int(n * s[0])
    va = int(n * (s[0] + s[1]))
    masks = {}
    for name, sl in (('train', perm[:tr]), ('val', perm[tr:va]),
                     ('test', perm[va:])):
        m = np.zeros(n, bool)
        m[sl] = True
        masks[name] = jnp.asarray(m)

    model = create_model(cfg)
    x = jnp.asarray(np.asarray(data.x))
    coo = jnp.asarray(np.asarray(
        data.edge_index.coo if hasattr(data.edge_index, 'coo')
        else data.edge_index))
    y = jnp.asarray(np.asarray(data.y))
    params = model.init(jax.random.PRNGKey(cfg.seed), x, coo)
    tx = optax.adamw(cfg.optim.base_lr,
                     weight_decay=cfg.optim.weight_decay)
    opt_state = tx.init(params)

    start_epoch = 0
    if cfg.train.enable_ckpt:
        ck = load_ckpt(run_dir)
        if ck is not None:
            params = jax.tree_util.tree_map(jnp.asarray, ck['params'])
            opt_state = (jax.tree_util.tree_map(jnp.asarray,
                                                ck['opt_state'])
                         if ck['opt_state'] is not None else opt_state)
            start_epoch = ck['epoch'] + 1

    @jax.jit
    def step(params, opt_state, mask):
        def loss_fn(p):
            logits = model.apply(p, x, coo)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.where(mask, l, 0).sum() / jnp.maximum(mask.sum(),
                                                             1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params, mask):
        logits = model.apply(params, x, coo)
        pred = logits.argmax(-1)
        l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        loss = jnp.where(mask, l, 0).sum() / jnp.maximum(mask.sum(), 1)
        acc = jnp.where(mask, pred == y, False).sum() / jnp.maximum(
            mask.sum(), 1)
        return loss, acc

    loggers = {k: Logger(run_dir, k) for k in masks}
    stats = {}
    for epoch in range(start_epoch, cfg.optim.max_epoch):
        params, opt_state, loss = step(params, opt_state, masks['train'])
        if (epoch + 1) % cfg.train.eval_period == 0:
            for split, mask in masks.items():
                l, a = evaluate(params, mask)
                loggers[split].update_stats(
                    None, None, float(l), int(mask.sum()))
                loggers[split]._correct = int(
                    float(a) * int(mask.sum()))
                stats[split] = loggers[split].write_epoch(epoch)
        if cfg.train.enable_ckpt and \
                (epoch + 1) % cfg.train.ckpt_period == 0:
            save_ckpt(run_dir, epoch, params, opt_state)
    if cfg.train.enable_ckpt:
        save_ckpt(run_dir, cfg.optim.max_epoch - 1, params, opt_state)
    return params, stats
