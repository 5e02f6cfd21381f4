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
    """cfg-driven stack (reference ``graphgym/models/gnn.py:GNN``)."""
    cfg: Any

    @fnn.compact
    def __call__(self, x, edge_index, edge_mask=None):
        import jax
        from .. import nn as pgnn
        # flax freezes the dict-typed field; index access works for both
        c = self.cfg
        gnn, dataset = c['gnn'], c['dataset']
        act = getattr(jax.nn, gnn['act'])
        lt = gnn['layer_type']
        if lt in registry['layer']:
            layer_cls = registry['layer'][lt]
        else:
            layer_cls = getattr(pgnn, _LAYERS[lt])
        for i in range(gnn['layers_mp']):
            if lt == 'ginconv':
                from ..nn.models.mlp import MLP
                conv = layer_cls(
                    mlp=MLP(channel_list=[gnn['dim_inner']] * 2,
                            name=f'mlp_{i}'), name=f'conv_{i}')
            else:
                conv = layer_cls(out_channels=gnn['dim_inner'],
                                 name=f'conv_{i}')
            x = conv(x, edge_index, edge_mask=edge_mask)
            x = act(x)
        x = fnn.Dense(dataset['num_classes'], name='head')(x)
        return x


def create_model(cfg: CfgNode) -> GraphGymGNN:
    """(reference ``model_builder.py:create_model``)."""
    return GraphGymGNN(cfg=cfg)
