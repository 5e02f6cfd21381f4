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


class GATEConv(fnn.Module):
    """Edge-conditioned GAT layer used by AttentiveFP
    (reference ``attentive_fp.py:GATEConv``): the transformed source
    x_j' = leaky_relu(lin1([x_j | edge_attr])) drives attention via
    att_l; the raw destination via att_r; messages are lin2(x_j)."""
    out_channels: int

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        att_l = self.param('att_l', fnn.initializers.glorot_uniform(),
                           (1, self.out_channels))
        att_r = self.param('att_r', fnn.initializers.glorot_uniform(),
                           (1, x.shape[-1]))
        xj = fnn.leaky_relu(
            fnn.Dense(self.out_channels, use_bias=False, name='lin1')(
                jnp.concatenate([x[src], edge_attr], -1)), 0.01)
        alpha = (xj * att_l).sum(-1) + (x[dst] * att_r).sum(-1)
        alpha = fnn.leaky_relu(alpha, 0.01)
        alpha = segment_softmax(alpha, dst, n, mask=edge_mask)
        msg = fnn.Dense(self.out_channels, use_bias=False,
                        name='lin2')(x[src]) * alpha[:, None]
        out = scatter(msg, dst, n, 'sum', mask=edge_mask)
        return out + self.param('bias', fnn.initializers.zeros,
                                (self.out_channels,))


def _gru(name: str, features: int):
    return fnn.GRUCell(features=features, name=name)


class AttentiveFP(fnn.Module):
    """Attentive FP (reference ``attentive_fp.py``): GATEConv + GATConv
    atom layers with GRU updates, then a virtual-molecule-node GAT
    readout iterated ``num_timesteps`` times."""
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
        from ..conv import GATConv
        from ..pool import global_add_pool
        n = x.shape[0]
        H = self.hidden_channels
        x = fnn.leaky_relu(fnn.Dense(H, name='lin1')(x), 0.01)

        h = fnn.elu(GATEConv(out_channels=H, name='gate_conv')(
            x, edge_index, edge_attr, edge_mask=edge_mask))
        x, _ = _gru('gru', H)(x, h)
        x = fnn.relu(x)

        for l in range(self.num_layers - 1):
            h = fnn.elu(GATConv(out_channels=H, add_self_loops=False,
                                negative_slope=0.01,
                                name=f'atom_convs_{l}')(
                x, edge_index, edge_mask=edge_mask))
            x, _ = _gru(f'atom_grus_{l}', H)(x, h)
            x = fnn.relu(x)

        # molecule embedding: bipartite GAT from atoms to mol nodes
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        rows = jnp.arange(n)
        mol_edge = jnp.stack([rows, batch.astype(rows.dtype)])
        out = fnn.relu(global_add_pool(x, batch, batch_size,
                                       mask=node_mask))
        mol_conv = GATConv(out_channels=H, add_self_loops=False,
                           negative_slope=0.01, name='mol_conv')
        mol_gru = _gru('mol_gru', H)
        for _ in range(self.num_timesteps):
            h = fnn.elu(mol_conv((x, out), mol_edge,
                                 edge_mask=node_mask))
            out, _ = mol_gru(out, h)
            out = fnn.relu(out)
        return fnn.Dense(self.out_channels, name='lin2')(out)


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
