"""BasicGNN model family (reference ``nn/models/basic_gnn.py:32``).

Stacks ``num_layers`` convolutions with activation, optional norm,
dropout, jumping-knowledge aggregation and a final projection — the
abstraction behind the reference's GCN / GraphSAGE / GIN / GAT / PNA /
EdgeCNN model classes (``basic_gnn.py:389-643``).
"""

from typing import Any, Callable, Dict, Optional

import flax.linen as fnn
import jax.numpy as jnp

from ..conv import GCNConv, SAGEConv, GINConv, GATConv, GATv2Conv
from .mlp import MLP


class BasicGNN(fnn.Module):
    hidden_channels: int
    num_layers: int
    out_channels: Optional[int] = None
    dropout: float = 0.0
    act: Callable = fnn.relu
    norm: Optional[str] = None           # None | 'layer_norm' | 'batch_norm'
    jk: Optional[str] = None             # None | 'last' | 'cat' | 'max'
    conv_kwargs: Optional[Dict[str, Any]] = None

    def init_conv(self, out_channels: int, idx: int) -> fnn.Module:
        raise NotImplementedError

    @property
    def _final_in_loop(self) -> bool:
        """Whether the final conv already outputs ``out_channels``
        (no jk, no post-projection) — mirrors reference logic
        ``basic_gnn.py:122-140``."""
        return self.out_channels is not None and self.jk is None

    @fnn.compact
    def __call__(self, x: jnp.ndarray, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        xs = []
        supports_weight = getattr(self, 'supports_edge_weight', False)
        supports_attr = getattr(self, 'supports_edge_attr', False)
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            ch = (self.out_channels
                  if is_last and self._final_in_loop
                  else self.hidden_channels)
            conv = self.init_conv(ch, i)
            kwargs = {}
            if supports_weight and edge_weight is not None:
                kwargs['edge_weight'] = edge_weight
            if supports_attr and edge_attr is not None:
                kwargs['edge_attr'] = edge_attr
            x = conv(x, edge_index, edge_mask=edge_mask, **kwargs)
            # reference basic_gnn.py:258: norm/act/dropout are skipped on
            # the last layer whenever jk is None (with or without a
            # trailing projection).
            if is_last and self.jk is None:
                xs.append(x)
                break
            if self.norm == 'layer_norm':
                x = fnn.LayerNorm(name=f'norm_{i}')(x)
            elif self.norm == 'batch_norm':
                x = fnn.BatchNorm(use_running_average=deterministic,
                                  name=f'norm_{i}')(x)
            x = self.act(x)
            if self.dropout > 0 and not deterministic:
                x = fnn.Dropout(self.dropout, deterministic=False)(x)
            xs.append(x)

        if self.jk == 'cat':
            x = jnp.concatenate(xs, axis=-1)
        elif self.jk == 'max':
            x = jnp.stack(xs, axis=0).max(axis=0)
        # 'last' / None: keep final x

        if self.out_channels is not None and not self._final_in_loop:
            x = fnn.Dense(self.out_channels, name='lin_out')(x)
        return x


class GCN(BasicGNN):
    """Stack of GCNConv (reference ``basic_gnn.py:389``)."""
    supports_edge_weight: bool = True
    supports_edge_attr: bool = False

    def init_conv(self, out_channels: int, idx: int):
        return GCNConv(out_channels=out_channels,
                       **(self.conv_kwargs or {}), name=f'conv_{idx}')


class GraphSAGE(BasicGNN):
    """Stack of SAGEConv (reference ``basic_gnn.py:434``)."""
    supports_edge_weight: bool = False
    supports_edge_attr: bool = False

    def init_conv(self, out_channels: int, idx: int):
        return SAGEConv(out_channels=out_channels,
                        **(self.conv_kwargs or {}), name=f'conv_{idx}')


class GIN(BasicGNN):
    """Stack of GINConv with 2-layer MLPs (reference ``basic_gnn.py:479``)."""
    supports_edge_weight: bool = False
    supports_edge_attr: bool = False

    def init_conv(self, out_channels: int, idx: int):
        # reference basic_gnn.py:517 builds MLP([in, out, out]) with the
        # default plain_last=True: the conv's last linear stays plain and
        # BasicGNN's own norm/act run afterwards.
        mlp = MLP(channel_list=[out_channels, out_channels],
                  act=self.act, name=f'mlp_{idx}')
        return GINConv(mlp=mlp, **(self.conv_kwargs or {}),
                       name=f'conv_{idx}')


class GAT(BasicGNN):
    """Stack of GAT(v2)Conv (reference ``basic_gnn.py:528``): hidden layers
    concat heads (hidden must divide heads), final layer averages."""
    heads: int = 1
    v2: bool = False
    supports_edge_weight: bool = False
    supports_edge_attr: bool = True

    def init_conv(self, out_channels: int, idx: int):
        is_final = (idx == self.num_layers - 1 and self._final_in_loop)
        concat = not is_final
        ch = out_channels // self.heads if concat else out_channels
        cls = GATv2Conv if self.v2 else GATConv
        return cls(out_channels=ch, heads=self.heads, concat=concat,
                   dropout=self.dropout, **(self.conv_kwargs or {}),
                   name=f'conv_{idx}')


class PNA(BasicGNN):
    """Stack of PNAConv (reference ``basic_gnn.py:600``)."""
    supports_edge_weight: bool = False
    supports_edge_attr: bool = True

    def init_conv(self, out_channels: int, idx: int):
        from ..conv import PNAConv
        return PNAConv(out_channels=out_channels,
                       **(self.conv_kwargs or {}), name=f'conv_{idx}')


class EdgeCNN(BasicGNN):
    """Stack of EdgeConv with 2-layer MLPs (reference
    ``basic_gnn.py:643``)."""
    supports_edge_weight: bool = False
    supports_edge_attr: bool = False

    def init_conv(self, out_channels: int, idx: int):
        from ..conv import EdgeConv
        from .mlp import MLP
        # reference basic_gnn.py:681: MLP([2*in, out, out]) with the
        # default plain_last=True (see GIN note above).
        mlp = MLP(channel_list=[out_channels, out_channels],
                  act=self.act, name=f'mlp_{idx}')
        return EdgeConv(nn=mlp, **(self.conv_kwargs or {}),
                        name=f'conv_{idx}')


def basic_gnn_inference(model: BasicGNN, params, data,
                        batch_size: int = 256,
                        num_neighbors_per_layer: int = 64,
                        edge_weight=None):
    """Layer-wise full-graph inference (reference
    ``basic_gnn.py:302-383``): computes each layer's representation for
    ALL nodes before the next layer, sampling only 1-hop neighborhoods
    per batch — avoids the exponential fanout of full L-hop sampling.
    Requires ``jk=None`` and ``norm in (None, 'layer_norm')``.

    A free function (not a method) so sub-conv construction happens
    outside any bound-module context."""
    import numpy as np
    import flax.linen as fnn2
    from ...loader import NeighborLoader

    p = params['params']
    x_all = np.asarray(data.x)
    n = data.num_nodes
    for layer in range(model.num_layers):
        is_last = layer == model.num_layers - 1
        ch = (model.out_channels if is_last and model._final_in_loop
              else model.hidden_channels)
        # bypass flax's method wrapping (would try to register the conv
        # as a child of the unbound model)
        raw_init = type(model).init_conv
        raw_init = getattr(raw_init, '__wrapped__',
                           getattr(raw_init, 'inner_fn', raw_init))
        conv = raw_init(model, ch, layer).clone(name=None)
        conv_params = {'params': p[f'conv_{layer}']}
        cur = data.replace(x=x_all.astype(np.float32))
        loader = NeighborLoader(
            cur, num_neighbors=[num_neighbors_per_layer],
            batch_size=batch_size, shuffle=False)
        outs = []
        for b in loader:
            kwargs = {}
            if edge_weight is not None:
                # gather precomputed full-graph normalisation weights by
                # global edge id (exactness for GCN-style norms — the
                # batch subgraph would otherwise see wrong degrees)
                w = np.asarray(edge_weight)[
                    np.where(np.asarray(b.edge_mask),
                             np.asarray(b.e_id), 0)]
                w[~np.asarray(b.edge_mask)] = 0
                kwargs['edge_weight'] = jnp.asarray(w)
            h = conv.apply(conv_params, jnp.asarray(b.x),
                           jnp.asarray(np.asarray(b.edge_index)),
                           edge_mask=jnp.asarray(b.edge_mask), **kwargs)
            if not (is_last and model._final_in_loop):
                if model.norm == 'layer_norm':
                    h = fnn2.LayerNorm().apply(
                        {'params': p[f'norm_{layer}']}, h)
                h = model.act(h)
                if is_last and model.out_channels is not None:
                    h = fnn2.Dense(model.out_channels).apply(
                        {'params': p['lin_out']}, h)
            bs = int(b.batch_size)
            outs.append(np.asarray(h[:bs]))
        x_all = np.concatenate(outs, 0)[:n]
    return jnp.asarray(x_all)
