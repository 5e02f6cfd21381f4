"""Build a GNN from cfg (reference
``torch_geometric/graphgym/model_builder.py`` + ``models/gnn.py``)."""

from typing import Any

import flax.linen as fnn

from .config import CfgNode
from .register import registry

_LAYERS = {
    'gcnconv': 'GCNConv',
    'sageconv': 'SAGEConv',
    'ginconv': 'GINConv',
    'gatconv': 'GATConv',
    'graphconv': 'GraphConv',
    'generalconv': 'GeneralConv',
}


class GraphGymGNN(fnn.Module):
    """cfg-driven model (reference ``graphgym/models/gnn.py:GNN``):
    pre-MP encoder (``layers_pre_mp``) -> message-passing stage
    (``stage_type``: stack | skipsum | skipconcat, per-layer
    conv -> [batchnorm] -> act -> [dropout] -> [l2norm],
    ``models/gnn.py:GNNStackStage``) -> task head (``layers_post_mp``
    MLP; graph tasks pool first with ``model.graph_pooling``,
    ``models/head.py``)."""
    cfg: Any
    deterministic: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, edge_mask=None, batch=None,
                 num_graphs: int = 1):
        import jax
        import jax.numpy as jnp
        from .. import nn as pgnn
        # flax freezes the dict-typed field; index access works for both
        c = self.cfg
        gnn, dataset = c['gnn'], c['dataset']
        act = getattr(jax.nn, gnn['act'])
        dim = gnn['dim_inner']
        lt = gnn['layer_type']
        if lt in registry['layer']:
            layer_cls = registry['layer'][lt]
        else:
            layer_cls = getattr(pgnn, _LAYERS[lt])

        for i in range(gnn.get('layers_pre_mp', 0)):
            x = act(fnn.Dense(dim, name=f'pre_mp_{i}')(x))

        stage = gnn.get('stage_type', 'stack')
        for i in range(gnn['layers_mp']):
            x_in = x
            if lt == 'ginconv':
                from ..nn.models.mlp import MLP
                conv = layer_cls(
                    mlp=MLP(channel_list=[dim] * 2,
                            name=f'mlp_{i}'), name=f'conv_{i}')
            else:
                conv = layer_cls(out_channels=dim, name=f'conv_{i}')
            x = conv(x, edge_index, edge_mask=edge_mask)
            if gnn.get('batchnorm', False):
                x = fnn.BatchNorm(use_running_average=self.deterministic,
                                  name=f'bn_{i}')(x)
            x = act(x)
            if gnn.get('dropout', 0.0) > 0 and not self.deterministic:
                x = fnn.Dropout(rate=gnn['dropout'],
                                deterministic=False)(x)
            if stage == 'skipsum' and x_in.shape[-1] == x.shape[-1]:
                x = x + x_in
            elif stage == 'skipconcat' and i < gnn['layers_mp'] - 1:
                x = jnp.concatenate([x_in, x], axis=-1)
        # reference GNNStackStage normalizes ONCE after the stage
        # (models/gnn.py), not per layer
        if gnn.get('l2norm', False):
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        if dataset.get('task', 'node') == 'graph':
            from ..nn.pool import global_add_pool, global_mean_pool, \
                global_max_pool
            pool = {'add': global_add_pool, 'sum': global_add_pool,
                    'mean': global_mean_pool, 'max': global_max_pool}[
                        c['model'].get('graph_pooling', 'add')]
            b = (batch if batch is not None
                 else jnp.zeros(x.shape[0], jnp.int32))
            x = pool(x, b, size=num_graphs)

        n_post = max(gnn.get('layers_post_mp', 1), 1)
        for i in range(n_post - 1):
            x = act(fnn.Dense(dim, name=f'post_mp_{i}')(x))
        return fnn.Dense(dataset['num_classes'], name='head')(x)


def create_model(cfg: CfgNode) -> GraphGymGNN:
    """(reference ``model_builder.py:create_model``)."""
    return GraphGymGNN(cfg=cfg)
