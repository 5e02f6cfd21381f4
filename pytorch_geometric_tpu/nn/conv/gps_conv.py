"""GPSConv + attention-family convs (GPS, RGAT, SuperGAT, HEAT).

Reference files: ``nn/conv/gps_conv.py`` (GraphGPS: local MPNN + global
attention + FFN), ``rgat_conv.py``, ``supergat_conv.py``,
``heat_conv.py``.
"""

import math
from typing import Any, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import scatter, softmax as segment_softmax
from ...ops.sddmm import fused_softmax_available


class GPSConv(fnn.Module):
    """h = MPNN(x, A) + GlobalAttention(x) -> FFN, with residuals+norm
    (reference ``gps_conv.py``). ``attn_type``: 'multihead' (dense, via
    to_dense_batch) or 'performer' (linear). ``norm``: 'batch_norm'
    (reference default; running stats in eval) or 'layer_norm'."""
    channels: int
    conv: Optional[MessagePassing] = None
    heads: int = 1
    attn_type: str = 'multihead'
    norm: Optional[str] = 'batch_norm'
    dropout: float = 0.0

    def _norm(self, name: str, x, deterministic: bool):
        if self.norm == 'batch_norm':
            return fnn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5,
                                 name=name)(x)
        if self.norm == 'layer_norm':
            return fnn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                                 name=name)(x)
        return x

    @fnn.compact
    def __call__(self, x, edge_index, batch=None, batch_size: int = 1,
                 max_num_nodes: Optional[int] = None,
                 node_mask: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 **conv_kwargs) -> jnp.ndarray:
        from ...utils.dense import to_dense_batch
        n = x.shape[0]
        hs = []
        if self.conv is not None:
            h = self.conv(x, edge_index, edge_mask=edge_mask,
                          **conv_kwargs)
            h = h + x
            h = self._norm('norm1', h, deterministic)
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
        counts = jnp.cumsum(jax.nn.one_hot(batch, batch_size,
                                           dtype=jnp.int32), axis=0)
        pos = counts[jnp.arange(n), batch] - 1
        pos = jnp.minimum(pos, L - 1)
        h2 = att[batch, pos]
        h2 = h2 + x
        h2 = self._norm('norm2', h2, deterministic)
        hs.append(h2)

        out = sum(hs)
        # reference gps_conv.py:163: out = out + mlp(out), then norm3
        ff = fnn.Dense(2 * self.channels, name='ff1')(out)
        ff = fnn.relu(ff)
        ff = fnn.Dense(self.channels, name='ff2')(ff)
        return self._norm('norm3', out + ff, deterministic)


class RGATConv(MessagePassing):
    """Relational GAT (reference ``rgat_conv.py``).

    Defaults match the reference: ``attention_mechanism
    ='across-relation'`` (one softmax over all incoming edges),
    ``attention_mode='additive-self-attention'``, global q/k projections
    shared across relations, per-relation weight bank (optionally
    basis-decomposed via ``num_bases``)."""
    out_channels: int
    num_relations: int = 1
    num_bases: Optional[int] = None
    heads: int = 1
    dim: int = 1                  # d of multiplicative mode
    concat: bool = True
    attention_mechanism: str = 'across-relation'
    attention_mode: str = 'additive-self-attention'
    mod: Optional[str] = None     # None | 'f-additive' | 'f-scaled'
    negative_slope: float = 0.2
    edge_dim: Optional[int] = None
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, edge_type: jnp.ndarray,
                 edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        H, C, R, d = self.heads, self.out_channels, self.num_relations, \
            self.dim
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        et = jnp.minimum(edge_type, R - 1)
        if self.num_bases is not None:
            att = self.param('att', fnn.initializers.glorot_uniform(),
                             (R, self.num_bases))
            basis = self.param('basis', fnn.initializers.glorot_uniform(),
                               (self.num_bases, x.shape[-1], H * C))
            w = jnp.einsum('rb,bfo->rfo', att, basis)
        else:
            w = self.param('weight', fnn.initializers.glorot_uniform(),
                           (R, x.shape[-1], H * C))
        # per-edge typed projections (reference message(): bmm over
        # index_select'ed weights; here one [R,F,HC] einsum + gather)
        h = jnp.einsum('nf,rfo->rno', x, w)            # [R, N, H*C]
        out_j = h[et, src]                             # [E, H*C]
        out_i = h[et, dst]
        q = self.param('q', fnn.initializers.glorot_uniform(),
                       (H * C, H * d))
        k = self.param('k', fnn.initializers.glorot_uniform(),
                       (H * C, H * d))
        qi = out_i @ q                                 # [E, H*d]
        kj = out_j @ k
        alpha_edge = 0.0
        if edge_attr is not None:
            e_p = self.param('e', fnn.initializers.glorot_uniform(),
                             (H * C, H * d))
            ea = fnn.Dense(H * C, use_bias=False,
                           name='lin_edge')(edge_attr)
            alpha_edge = ea @ e_p
        if self.attention_mode == 'additive-self-attention':
            alpha = fnn.leaky_relu(qi + kj + alpha_edge,
                                   self.negative_slope)
        else:
            alpha = qi * kj
            if edge_attr is not None:
                alpha = alpha * alpha_edge
        if self.attention_mechanism == 'within-relation':
            # per-relation softmax: normalise within (dst, relation)
            # groups by offsetting segment ids
            seg = dst * R + et
            alpha = segment_softmax(alpha, seg, n * R, mask=edge_mask)
        else:
            alpha = segment_softmax(alpha, dst, n, mask=edge_mask)
        if self.mod == 'f-additive':
            alpha = jnp.where(alpha > 0, alpha + 1, alpha)
        elif self.mod == 'f-scaled':
            ones = jnp.ones((coo.shape[1],), alpha.dtype)
            if edge_mask is not None:
                ones = jnp.where(edge_mask, ones, 0.0)
            deg = scatter(ones[:, None], dst, n, 'sum')[dst]
            alpha = alpha * deg
        if self.attention_mode == 'additive-self-attention':
            msg = (alpha.reshape(-1, H, 1)
                   * out_j.reshape(-1, H, C)).reshape(-1, H * C)
            out = scatter(msg, dst, n, 'sum', mask=edge_mask)
            out = (out if self.concat
                   else out.reshape(n, H, C).mean(1))
        else:
            msg = (alpha.reshape(-1, H, d, 1)
                   * out_j.reshape(-1, H, 1, C)).reshape(-1, H * d * C)
            out = scatter(msg, dst, n, 'sum', mask=edge_mask)
            out = (out if self.concat
                   else out.reshape(n, H, d * C).mean(1))
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (out.shape[-1],))
        return out


class SuperGATConv(MessagePassing):
    """GAT with self-supervised attention (reference
    ``supergat_conv.py``). ``attention_type='MX'``:
    alpha = (a_l . x_j + a_r . x_i) * sigmoid(x_i . x_j); 'SD':
    alpha = x_i . x_j / sqrt(C). leaky_relu then edge softmax. The
    auxiliary link-prediction logits are exposed via
    ``get_attention_logits``."""
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    add_self_loops: bool = True
    attention_type: str = 'MX'
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from .point_conv import _with_self_loops
        n = x.shape[0]
        H, C = self.heads, self.out_channels
        if self.add_self_loops:
            edge_index, edge_mask = _with_self_loops(edge_index,
                                                     edge_mask, n)
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        h = fnn.Dense(H * C, use_bias=False, name='lin')(x).reshape(
            n, H, C)
        if self.attention_type == 'MX':
            a_l = self.param('att_l', fnn.initializers.glorot_uniform(),
                             (1, H, C))
            a_r = self.param('att_r', fnn.initializers.glorot_uniform(),
                             (1, H, C))
            e_l = (h * a_l).sum(-1)           # applied to x_j (src)
            e_r = (h * a_r).sum(-1)           # applied to x_i (dst)
            logits = (h[src] * h[dst]).sum(-1)
            alpha = (e_l[src] + e_r[dst]) * jax.nn.sigmoid(logits)
        else:  # 'SD'
            alpha = (h[src] * h[dst]).sum(-1) / math.sqrt(C)
        alpha = fnn.leaky_relu(alpha, self.negative_slope)
        if fused_softmax_available(edge_index) \
                and not self.add_self_loops:
            from ...ops.gat_fused import gat_aggregate
            out = gat_aggregate(edge_index, alpha, h,
                                edge_mask=edge_mask)
            out = out.reshape(n, H * C)
        else:
            alpha = segment_softmax(alpha, dst, n, mask=edge_mask)
            msg = h[src] * alpha[..., None]
            out = scatter(msg.reshape(-1, H * C), dst, n, 'sum',
                          mask=edge_mask)
        if not self.concat:
            out = out.reshape(n, H, C).mean(1)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (out.shape[-1],))
        return out


class HEATConv(MessagePassing):
    """Heterogeneous edge-attribute transformer (reference
    ``heat_conv.py``): typed node projections, leaky-relu'd edge
    type/attr embeddings, attention over [x_i | x_j | type_emb |
    attr_emb], values from lin([x_j | attr_emb])."""
    out_channels: int
    num_node_types: int = 1
    num_edge_types: int = 1
    edge_type_emb_dim: int = 8
    edge_dim: int = 8
    edge_attr_emb_dim: int = 8
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    root_weight: bool = True
    use_bias: bool = True

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
                         use_bias=self.use_bias,
                         name='hetero_lin')(x, node_type)
        ete = fnn.Embed(self.num_edge_types, self.edge_type_emb_dim,
                        name='edge_type_emb')(edge_type)
        ete = fnn.leaky_relu(ete, self.negative_slope)
        eae = fnn.Dense(self.edge_attr_emb_dim, use_bias=False,
                        name='edge_attr_emb')(edge_attr)
        eae = fnn.leaky_relu(eae, self.negative_slope)
        # reference heat_conv.py:message: [x_i | x_j | type_emb | attr]
        feat = jnp.concatenate([h[dst], h[src], ete, eae], -1)
        alpha = fnn.Dense(H, use_bias=False, name='att')(feat)
        alpha = fnn.leaky_relu(alpha, self.negative_slope)
        v = fnn.Dense(C, use_bias=self.use_bias, name='lin_v')(
            jnp.concatenate([h[src], eae], -1))       # [E, C]
        alpha = segment_softmax(alpha, dst, n, mask=edge_mask)
        msg = (v[:, None, :] * alpha[..., None]).reshape(-1, H * C)
        out = scatter(msg, dst, n, 'sum', mask=edge_mask)
        if self.concat:
            if self.root_weight:
                out = (out.reshape(n, H, C)
                       + h[:, None, :]).reshape(n, H * C)
            return out
        out = out.reshape(n, H, C).mean(1)
        if self.root_weight:
            out = out + h
        return out
