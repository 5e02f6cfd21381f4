"""AttentiveFP, SignedGCN, RECT_L, GroupAddRev.

Reference files under ``torch_geometric/nn/models/``:
``attentive_fp.py``, ``signed_gcn.py``,
``rect.py``, ``rev_gnn.py:196``.
"""

from typing import Callable, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ..conv import GATConv, SignedConv
from ..message_passing import MessagePassing
from ...ops import scatter, softmax as segment_softmax


class AttentiveFP(fnn.Module):
    """Graph attention for molecules (reference ``attentive_fp.py``):
    GATE-style edge attention + GRU updates + global attention readout."""
    in_channels: int
    hidden_channels: int
    out_channels: int
    edge_dim: int
    num_layers: int = 2
    num_timesteps: int = 2

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr, batch=None,
                 batch_size: int = 1,
                 node_mask: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        h = fnn.leaky_relu(fnn.Dense(self.hidden_channels,
                                     name='lin1')(x), 0.01)

        # first layer: edge-conditioned attention
        he = fnn.leaky_relu(fnn.Dense(self.hidden_channels,
                                      name='lin_edge')(edge_attr), 0.01)
        z = jnp.concatenate([h[src] + he, h[dst]], -1)
        alpha = fnn.Dense(1, name='att1')(z)[:, 0]
        alpha = segment_softmax(fnn.leaky_relu(alpha, 0.01), dst, n,
                                mask=edge_mask)
        msg = h[src] * alpha[:, None]
        agg = scatter(msg, dst, n, 'sum', mask=edge_mask)
        gru = fnn.GRUCell(features=self.hidden_channels, name='gru0')
        h, _ = gru(h, fnn.elu(fnn.Dense(self.hidden_channels,
                                        name='mix0')(agg)))

        for l in range(1, self.num_layers):
            z = jnp.concatenate([h[src], h[dst]], -1)
            alpha = fnn.Dense(1, name=f'att_{l}')(z)[:, 0]
            alpha = segment_softmax(fnn.leaky_relu(alpha, 0.01), dst, n,
                                    mask=edge_mask)
            agg = scatter(h[src] * alpha[:, None], dst, n, 'sum',
                          mask=edge_mask)
            cell = fnn.GRUCell(features=self.hidden_channels,
                               name=f'gru_{l}')
            h, _ = cell(h, fnn.elu(fnn.Dense(self.hidden_channels,
                                             name=f'mix_{l}')(agg)))

        # molecule-level readout with attention over nodes
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        g = scatter(h, batch, batch_size, 'sum', mask=node_mask)
        mol_gru = fnn.GRUCell(features=self.hidden_channels,
                              name='mol_gru')
        for t in range(self.num_timesteps):
            ga = fnn.Dense(1, name=f'mol_att_{t}')(
                jnp.concatenate([g[batch], h], -1))[:, 0]
            ga = segment_softmax(fnn.leaky_relu(ga, 0.01), batch,
                                 batch_size, mask=node_mask)
            ctx = scatter(h * ga[:, None], batch, batch_size, 'sum',
                          mask=node_mask)
            g, _ = mol_gru(g, fnn.elu(ctx))
        return fnn.Dense(self.out_channels, name='lin2')(g)


class SignedGCN(fnn.Module):
    """Signed graph embedding (reference ``signed_gcn.py``)."""
    in_channels: int
    hidden_channels: int
    num_layers: int = 2
    lamb: float = 5.0

    @fnn.compact
    def __call__(self, x, pos_edge_index, neg_edge_index) -> jnp.ndarray:
        h = fnn.relu(SignedConv(out_channels=self.hidden_channels,
                                first_aggr=True, name='conv0')(
            x, pos_edge_index, neg_edge_index))
        for i in range(1, self.num_layers):
            h = fnn.relu(SignedConv(out_channels=self.hidden_channels,
                                    first_aggr=False, name=f'conv_{i}')(
                h, pos_edge_index, neg_edge_index))
        return h

    @staticmethod
    def discriminate(params, lin_apply, z, edge_index):
        coo = edge_index
        feats = jnp.concatenate([z[coo[0]], z[coo[1]]], -1)
        return lin_apply(params, feats)

    @staticmethod
    def pos_embedding_loss(z, pos_edge_index) -> jnp.ndarray:
        coo = pos_edge_index
        d = ((z[coo[0]] - z[coo[1]]) ** 2).sum(-1)
        return d.mean()

    @staticmethod
    def neg_embedding_loss(z, neg_edge_index) -> jnp.ndarray:
        coo = neg_edge_index
        d = ((z[coo[0]] - z[coo[1]]) ** 2).sum(-1)
        return jnp.maximum(0, 1 - d).mean()


class RECT_L(fnn.Module):
    """RECT supervised part (reference ``rect.py``): GCN + feature
    reconstruction of class-mean semantics."""
    in_channels: int
    hidden_channels: int
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..conv import GCNConv
        h = GCNConv(out_channels=self.hidden_channels, name='conv')(
            x, edge_index, edge_weight=edge_weight)
        return fnn.Dense(self.in_channels, name='lin')(h)

    @staticmethod
    def get_semantic_labels(x: np.ndarray, y: np.ndarray,
                            mask: np.ndarray) -> np.ndarray:
        """Class-mean feature targets (reference ``rect.py``)."""
        out = np.zeros_like(np.asarray(x)[mask])
        ym = np.asarray(y)[mask]
        xm = np.asarray(x)[mask]
        for c in np.unique(ym):
            out[ym == c] = xm[ym == c].mean(0)
        return out


class GroupAddRev(fnn.Module):
    """Grouped reversible residual GNN block (reference
    ``rev_gnn.py:196``): split channels into groups; each group is
    updated with the conv applied to the sum of the others. Memory-side
    the reference recomputes activations in backward; under jax use
    ``jax.checkpoint`` around the block for the same effect."""
    conv: MessagePassing
    num_groups: int = 2

    @fnn.compact
    def __call__(self, x, edge_index, **kwargs) -> jnp.ndarray:
        import dataclasses
        G = self.num_groups
        xs = jnp.split(x, G, axis=-1)
        fields = {f.name: getattr(self.conv, f.name)
                  for f in dataclasses.fields(type(self.conv))
                  if f.name not in ('parent', 'name')}
        ys = []
        y_prev = sum(xs[1:]) if G > 1 else xs[0]
        for g in range(G):
            conv = type(self.conv)(**fields, name=f'conv_{g}')
            y = xs[g] + conv(y_prev, edge_index, **kwargs)
            ys.append(y)
            y_prev = y
        return jnp.concatenate(ys, -1)
