"""GPSConv + attention-family convs (GPS, RGAT, SuperGAT, HEAT).

Reference files: ``nn/conv/gps_conv.py`` (GraphGPS: local MPNN + global
attention + FFN), ``rgat_conv.py``, ``supergat_conv.py``,
``heat_conv.py``.
"""

from typing import Any, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import scatter, softmax as segment_softmax
from ...ops.sddmm import edge_softmax_aggregate, fused_softmax_available


class GPSConv(fnn.Module):
    """h = MPNN(x, A) + GlobalAttention(x) -> FFN, with residuals+norm
    (reference ``gps_conv.py``). ``attn_type``: 'multihead' (dense, via
    to_dense_batch) or 'performer' (linear)."""
    channels: int
    conv: Optional[MessagePassing] = None
    heads: int = 1
    attn_type: str = 'multihead'
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x, edge_index, batch=None, batch_size: int = 1,
                 max_num_nodes: Optional[int] = None,
                 node_mask: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 **conv_kwargs) -> jnp.ndarray:
        from ...utils.dense import to_dense_batch
        n = x.shape[0]
        hs = []
        if self.conv is not None:
            h = self.conv(x, edge_index, edge_mask=edge_mask,
                          **conv_kwargs)
            h = h + x
            h = fnn.LayerNorm(name='norm1')(h)
            hs.append(h)

        # global attention over the (padded) per-graph node sets
        L = max_num_nodes or n
        dense, valid = to_dense_batch(x, batch, batch_size, L)
        if node_mask is not None:
            dm, _ = to_dense_batch(node_mask[:, None].astype(jnp.int32),
                                   batch, batch_size, L)
            valid = valid & (dm[..., 0] > 0)
        if self.attn_type == 'performer':
            from ..attention import PerformerAttention
            att = PerformerAttention(channels=self.channels,
                                     heads=self.heads, name='attn')(
                dense, mask=valid.astype(dense.dtype))
        else:
            att = fnn.MultiHeadDotProductAttention(
                num_heads=self.heads, name='attn')(
                    dense, dense, mask=valid[:, None, None, :])
        # back to flat nodes
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        ones = jnp.ones((n,), jnp.int32)
        counts = jnp.cumsum(jax.nn.one_hot(batch, batch_size,
                                           dtype=jnp.int32), axis=0)
        pos = counts[jnp.arange(n), batch] - 1
        pos = jnp.minimum(pos, L - 1)
        h2 = att[batch, pos]
        h2 = h2 + x
        h2 = fnn.LayerNorm(name='norm2')(h2)
        hs.append(h2)

        out = sum(hs)
        ff = fnn.Dense(2 * self.channels, name='ff1')(out)
        ff = fnn.relu(ff)
        ff = fnn.Dense(self.channels, name='ff2')(ff)
        return fnn.LayerNorm(name='norm3')(out + ff)


class RGATConv(MessagePassing):
    """Relational GAT (reference ``rgat_conv.py``, simplified
    'within-relation' attention mode)."""
    out_channels: int
    num_relations: int = 1
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2

    @fnn.compact
    def __call__(self, x, edge_index, edge_type: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        H, C, R = self.heads, self.out_channels, self.num_relations
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        et = jnp.minimum(edge_type, R - 1)
        w = self.param('weight', fnn.initializers.glorot_uniform(),
                       (R, x.shape[-1], H * C))
        h = jnp.einsum('nf,rfo->rno', x, w).reshape(R, n, H, C)
        h_j = h[et, src]                       # [E, H, C]
        h_i = h[et, dst]
        a = self.param('att', fnn.initializers.glorot_uniform(),
                       (R, H, 2 * C))
        a_e = a[et]                            # [E, H, 2C]
        alpha = (jnp.concatenate([h_i, h_j], -1) * a_e).sum(-1)
        alpha = fnn.leaky_relu(alpha, self.negative_slope)
        if fused_softmax_available(edge_index):
            # per-edge values (relation-dependent message) -> fused
            # MXU softmax-aggregation (ops/sddmm.py)
            out = edge_softmax_aggregate(edge_index, alpha, h_j,
                                         edge_mask=edge_mask)
            out = out.reshape(n, H * C)
        else:
            alpha = segment_softmax(alpha, dst, n, mask=edge_mask)
            msg = h_j * alpha[..., None]
            out = scatter(msg.reshape(-1, H * C), dst, n, 'sum',
                          mask=edge_mask)
        if self.concat:
            return out
        return out.reshape(n, H, C).mean(1)


class SuperGATConv(MessagePassing):
    """GAT with self-supervised attention (reference
    ``supergat_conv.py``; 'MX' variant). Returns node features; the
    auxiliary link-prediction logits are exposed via
    ``get_attention_logits``."""
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        H, C = self.heads, self.out_channels
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        h = fnn.Dense(H * C, use_bias=False, name='lin')(x).reshape(
            n, H, C)
        a_src = self.param('att_src', fnn.initializers.glorot_uniform(),
                           (1, H, C))
        a_dst = self.param('att_dst', fnn.initializers.glorot_uniform(),
                           (1, H, C))
        e_src = (h * a_src).sum(-1)
        e_dst = (h * a_dst).sum(-1)
        logits = e_src[src] + e_dst[dst]
        # MX: gate by sigmoid of the dot-product link score
        dot = (h[src] * h[dst]).sum(-1) / jnp.sqrt(C)
        alpha = fnn.leaky_relu(logits, self.negative_slope) \
            * jax.nn.sigmoid(dot)
        if fused_softmax_available(edge_index):
            from ...ops.gat_fused import gat_aggregate
            out = gat_aggregate(edge_index, alpha, h,
                                edge_mask=edge_mask)
            out = out.reshape(n, H * C)
        else:
            alpha = segment_softmax(alpha, dst, n, mask=edge_mask)
            msg = h[src] * alpha[..., None]
            out = scatter(msg.reshape(-1, H * C), dst, n, 'sum',
                          mask=edge_mask)
        if self.concat:
            return out
        return out.reshape(n, H, C).mean(1)


class HEATConv(MessagePassing):
    """Heterogeneous edge-attribute transformer (reference
    ``heat_conv.py``): typed node projections + edge-attr attention."""
    out_channels: int
    num_node_types: int = 1
    num_edge_types: int = 1
    edge_type_emb_dim: int = 8
    edge_dim: int = 8
    edge_attr_emb_dim: int = 8
    heads: int = 1

    @fnn.compact
    def __call__(self, x, edge_index, node_type: jnp.ndarray,
                 edge_type: jnp.ndarray, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..dense.linear import HeteroLinear
        n = x.shape[0]
        H, C = self.heads, self.out_channels
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        h = HeteroLinear(out_channels=C, num_types=self.num_node_types,
                         name='hetero_lin')(x, node_type)
        ete = fnn.Embed(self.num_edge_types, self.edge_type_emb_dim,
                        name='edge_type_emb')(edge_type)
        ete = fnn.relu(ete)
        eae = fnn.Dense(self.edge_attr_emb_dim, use_bias=False,
                        name='edge_attr_emb')(edge_attr)
        feat = jnp.concatenate([h[src], h[dst], eae, ete], -1)
        alpha = fnn.Dense(H, name='att')(feat)
        alpha = fnn.leaky_relu(alpha, 0.2)
        v = fnn.Dense(H * C, use_bias=False, name='lin_v')(
            jnp.concatenate([h[src], eae], -1)).reshape(-1, H, C)
        if fused_softmax_available(edge_index):
            out = edge_softmax_aggregate(edge_index, alpha, v,
                                         edge_mask=edge_mask)
            return out.reshape(n, H * C)
        alpha = segment_softmax(alpha, dst, n, mask=edge_mask)
        msg = v * alpha[..., None]
        return scatter(msg.reshape(-1, H * C), dst, n, 'sum',
                       mask=edge_mask)
