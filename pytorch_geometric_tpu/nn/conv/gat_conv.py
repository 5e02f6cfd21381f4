"""GAT / GATv2 — attention convolutions.

Reference: ``nn/conv/gat_conv.py:35`` and ``gatv2_conv.py``. The attention
coefficient pass is the reference's ``edge_update`` (``gat_conv.py:387``):
LeakyReLU -> grouped softmax over incoming edges -> dropout; message is
``alpha * x_j`` (``:408``). The 3-pass edge softmax fuses under XLA; a
Pallas fused variant is the ops/pallas follow-up.
"""

from typing import Optional, Tuple, Union

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import softmax
from ...ops.gat_fused import fused_gat_available, gat_aggregate
from ...ops.pallas_spmm import _use_pallas
from ...utils.loop import add_self_loops as _add_self_loops


def _loop_edge_attr(edge_attr, dst, keep, num_dst, fill_value):
    """Edge features for the appended self loops (reference
    ``gat_conv.py`` fill_value='mean': mean of each node's kept incident
    edge features; numeric fill_value broadcasts)."""
    if not isinstance(fill_value, str):
        return jnp.full((num_dst,) + edge_attr.shape[1:],
                        fill_value, edge_attr.dtype)
    if fill_value != 'mean':
        raise ValueError(f"Unsupported fill_value {fill_value!r}")
    w = keep.astype(edge_attr.dtype)
    seg = jnp.where(keep, jnp.minimum(dst, num_dst - 1), num_dst)
    flat = edge_attr.reshape(edge_attr.shape[0], -1)
    sums = jax.ops.segment_sum(flat * w[:, None], seg, num_dst + 1)
    cnt = jax.ops.segment_sum(w, seg, num_dst + 1)
    mean = sums[:num_dst] / jnp.maximum(cnt[:num_dst, None], 1)
    return mean.reshape((num_dst,) + edge_attr.shape[1:])


def _dropout_scale(module, dropout, deterministic, shape):
    """Numerator-only dropout multiplier (None when inactive)."""
    if dropout <= 0 or deterministic:
        return None
    rng = module.make_rng('dropout')
    keep = jax.random.bernoulli(rng, 1.0 - dropout, shape)
    return keep.astype(jnp.float32) / (1.0 - dropout)


class GATConv(MessagePassing):
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_self_loops: bool = True
    edge_dim: Optional[int] = None
    fill_value: Union[float, str] = 'mean'
    use_bias: bool = True
    aggr: str = 'sum'

    @fnn.compact
    def __call__(self, x: Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]],
                 edge_index, edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 return_attention_weights: bool = False):
        H, C = self.heads, self.out_channels
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        shared = x_dst is x_src   # non-bipartite: one shared projection
        num_src, num_dst = x_src.shape[0], x_dst.shape[0]

        x_src = fnn.Dense(H * C, use_bias=False,
                          kernel_init=fnn.initializers.glorot_uniform(),
                          name='lin_src')(x_src).reshape(num_src, H, C)
        if shared:
            x_dst = x_src
        else:
            x_dst = fnn.Dense(H * C, use_bias=False,
                              kernel_init=fnn.initializers.glorot_uniform(),
                              name='lin_dst')(x_dst).reshape(num_dst, H, C)

        att_src = self.param('att_src', fnn.initializers.glorot_uniform(),
                             (1, H, C))
        att_dst = self.param('att_dst', fnn.initializers.glorot_uniform(),
                             (1, H, C))
        alpha_src = (x_src * att_src).sum(-1)  # [N_src, H]
        alpha_dst = (x_dst * att_dst).sum(-1)  # [N_dst, H]

        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        if self.add_self_loops and num_src == num_dst:
            # reference gat_conv removes existing self loops, then adds
            # fresh ones — static-shape: mask out existing, append all
            is_loop = coo[0] == coo[1]
            keep = ~is_loop
            edge_mask = keep if edge_mask is None else (edge_mask & keep)
            if edge_attr is not None:
                loop_attr = _loop_edge_attr(edge_attr, coo[1], edge_mask,
                                            num_dst, self.fill_value)
            coo, _ = _add_self_loops(coo, num_nodes=num_dst)
            edge_mask = jnp.concatenate(
                [edge_mask, jnp.ones((num_dst,), bool)])
            if edge_attr is not None:
                edge_attr = jnp.concatenate([edge_attr, loop_attr])

        j_idx = jnp.minimum(coo[0], num_src - 1)
        i_idx = jnp.minimum(coo[1], num_dst - 1)
        alpha = alpha_src[j_idx] + alpha_dst[i_idx]  # [E, H]
        if edge_attr is not None:
            att_edge = self.param('att_edge',
                                  fnn.initializers.glorot_uniform(),
                                  (1, H, C))
            ea = fnn.Dense(H * C, use_bias=False, name='lin_edge')(
                edge_attr).reshape(-1, H, C)
            alpha = alpha + (ea * att_edge).sum(-1)
        alpha = fnn.leaky_relu(alpha, negative_slope=self.negative_slope)
        valid = coo[1] < num_dst
        if edge_mask is not None:
            valid = valid & edge_mask

        # fused MXU softmax-aggregation: only when the conv did not
        # rewrite the edge set (self-loop append invalidates the cached
        # blocked layout) and attention weights aren't requested
        fused_ok = (not (self.add_self_loops and num_src == num_dst)
                    and not return_attention_weights
                    and fused_gat_available(edge_index) and _use_pallas())
        # giant-graph path: [E, H] logits lane-pad 32x and [E, H, C]
        # messages do not fit HBM at products scale — the online-
        # softmax flash scan bounds peak memory to one edge chunk
        import os as _os
        flash_ok = (not fused_ok and not return_attention_weights
                    and edge_attr is None
                    and (self.dropout == 0 or deterministic)
                    and coo.shape[1] * H * C * 4 > float(_os.environ.get(
                        'PGT_ATTN_WIDE_BYTES', 1e9)))
        if fused_ok:
            scale = _dropout_scale(self, self.dropout, deterministic,
                                   alpha.shape)
            out = gat_aggregate(edge_index, alpha, x_src,
                                edge_mask=valid, numerator_scale=scale)
        elif flash_ok:
            from ...ops.edge_attention import gat_flash_attention
            # alpha here is pre-activation (leaky_relu applied in the
            # scan); rebuild node-level parts rather than the [E, H]
            # edge array
            out = gat_flash_attention(
                alpha_src, alpha_dst, x_src, j_idx,
                jnp.where(valid, i_idx, num_dst), num_dst,
                negative_slope=self.negative_slope)
        else:
            alpha = softmax(alpha, i_idx, num_dst, mask=valid)
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng('dropout')
                keep = jax.random.bernoulli(rng, 1.0 - self.dropout,
                                            alpha.shape)
                alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0)
            msgs = x_src[j_idx] * alpha[..., None]       # [E, H, C]
            msgs = jnp.where(valid[:, None, None], msgs, 0)
            out = jax.ops.segment_sum(msgs,
                                      jnp.where(valid, i_idx, num_dst),
                                      num_dst)

        if self.concat:
            out = out.reshape(num_dst, H * C)
        else:
            out = out.mean(axis=1)
        if self.use_bias:
            bias = self.param('bias', fnn.initializers.zeros,
                              (H * C if self.concat else C,))
            out = out + bias
        if return_attention_weights:
            return out, (coo, alpha)
        return out


class GATv2Conv(MessagePassing):
    """GATv2 (Brody et al.): attention applied after the nonlinearity on the
    *joint* transformed features (reference ``gatv2_conv.py``)."""
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_self_loops: bool = True
    edge_dim: Optional[int] = None
    fill_value: Union[float, str] = 'mean'
    use_bias: bool = True
    share_weights: bool = False
    aggr: str = 'sum'

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 return_attention_weights: bool = False):
        H, C = self.heads, self.out_channels
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        num_src, num_dst = x_src.shape[0], x_dst.shape[0]

        lin_l = fnn.Dense(H * C, use_bias=self.use_bias,
                          kernel_init=fnn.initializers.glorot_uniform(),
                          name='lin_l')
        x_l = lin_l(x_src).reshape(num_src, H, C)
        if self.share_weights:
            x_r = lin_l(x_dst).reshape(num_dst, H, C)
        else:
            x_r = fnn.Dense(H * C, use_bias=self.use_bias,
                            kernel_init=fnn.initializers.glorot_uniform(),
                            name='lin_r')(x_dst).reshape(num_dst, H, C)

        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        if self.add_self_loops and num_src == num_dst:
            # remove existing + add fresh self loops (reference behavior)
            keep = coo[0] != coo[1]
            edge_mask = keep if edge_mask is None else (edge_mask & keep)
            if edge_attr is not None:
                loop_attr = _loop_edge_attr(edge_attr, coo[1], edge_mask,
                                            num_dst, self.fill_value)
            coo, _ = _add_self_loops(coo, num_nodes=num_dst)
            edge_mask = jnp.concatenate(
                [edge_mask, jnp.ones((num_dst,), bool)])
            if edge_attr is not None:
                edge_attr = jnp.concatenate([edge_attr, loop_attr])

        j_idx = jnp.minimum(coo[0], num_src - 1)
        i_idx = jnp.minimum(coo[1], num_dst - 1)
        joint = x_l[j_idx] + x_r[i_idx]                 # [E, H, C]
        if edge_attr is not None:
            ea = fnn.Dense(H * C, use_bias=False, name='lin_edge')(
                edge_attr).reshape(-1, H, C)
            joint = joint + ea
        joint = fnn.leaky_relu(joint, negative_slope=self.negative_slope)
        att = self.param('att', fnn.initializers.glorot_uniform(), (1, H, C))
        alpha = (joint * att).sum(-1)                   # [E, H]
        valid = coo[1] < num_dst
        if edge_mask is not None:
            valid = valid & edge_mask

        fused_ok = (not (self.add_self_loops and num_src == num_dst)
                    and not return_attention_weights
                    and fused_gat_available(edge_index) and _use_pallas())
        import os as _os
        flash_ok = (not fused_ok and not return_attention_weights
                    and edge_attr is None
                    and (self.dropout == 0 or deterministic)
                    and coo.shape[1] * H * C * 4 > float(_os.environ.get(
                        'PGT_ATTN_WIDE_BYTES', 1e9)))
        if fused_ok:
            scale = _dropout_scale(self, self.dropout, deterministic,
                                   alpha.shape)
            out = gat_aggregate(edge_index, alpha, x_l,
                                edge_mask=valid, numerator_scale=scale)
        elif flash_ok:
            # giant-graph path: the [E, H, C] joint features never fit
            # HBM — compute them per chunk in the online-softmax scan
            from ...ops.edge_attention import gatv2_flash_attention
            out = gatv2_flash_attention(
                x_l, x_r, att[0], j_idx,
                jnp.where(valid, i_idx, num_dst), num_dst,
                negative_slope=self.negative_slope)
        else:
            alpha = softmax(alpha, i_idx, num_dst, mask=valid)
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng('dropout')
                keep = jax.random.bernoulli(rng, 1.0 - self.dropout,
                                            alpha.shape)
                alpha = jnp.where(keep, alpha / (1.0 - self.dropout), 0)
            msgs = x_l[j_idx] * alpha[..., None]
            msgs = jnp.where(valid[:, None, None], msgs, 0)
            out = jax.ops.segment_sum(msgs,
                                      jnp.where(valid, i_idx, num_dst),
                                      num_dst)
        if self.concat:
            out = out.reshape(num_dst, H * C)
        else:
            out = out.mean(axis=1)
        if self.use_bias:
            bias = self.param('bias', fnn.initializers.zeros,
                              (H * C if self.concat else C,))
            out = out + bias
        if return_attention_weights:
            return out, (coo, alpha)
        return out


class FusedGATConv(GATConv):
    """Alias of :class:`GATConv` (reference ``fused_gat_conv.py`` wraps
    dgNN CUDA kernels): here the fused path IS the default — GATConv
    dispatches onto the Pallas MXU softmax-aggregation kernel whenever
    the blocked edge layout is cached (see ``ops/gat_fused.py``)."""

    @staticmethod
    def to_graph_format(edge_index, size=None):
        """(reference ``fused_gat_conv.py:to_graph_format``) — returns
        the EdgeIndex with blocked caches filled, the analog of the
        CSR/CSC/permutation triple dgNN wants."""
        from ...edge_index import EdgeIndex
        if not isinstance(edge_index, EdgeIndex):
            edge_index = EdgeIndex(edge_index, size)
        return edge_index.fill_cache(blocked=True)


# CUDA-ecosystem aliases (reference nn/conv/cugraph/*): cugraph wraps
# CUDA kernels for GAT/RGCN/SAGE; on TPU the same role is played by the
# Pallas fused/blocked paths, so these resolve to the native convs.
CuGraphGATConv = FusedGATConv
