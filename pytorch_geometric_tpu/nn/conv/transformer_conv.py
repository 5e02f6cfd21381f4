"""TransformerConv — graph transformer attention
(reference ``nn/conv/transformer_conv.py``, Shi et al. UniMP).
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax.numpy as jnp

from ..message_passing import MessagePassing


class TransformerConv(MessagePassing):
    """Multi-head QKV attention over edges with optional edge features and
    beta-gated skip (reference ``transformer_conv.py``)."""
    out_channels: int
    heads: int = 1
    concat: bool = True
    beta: bool = False
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    root_weight: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 return_attention_weights: bool = False):
        H, C = self.heads, self.out_channels
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n_src, n_dst = x_src.shape[0], x_dst.shape[0]

        q = fnn.Dense(H * C, name='lin_query')(x_dst).reshape(n_dst, H, C)
        k = fnn.Dense(H * C, name='lin_key')(x_src).reshape(n_src, H, C)
        v = fnn.Dense(H * C, name='lin_value')(x_src).reshape(n_src, H, C)
        e = None
        if edge_attr is not None:
            e = fnn.Dense(H * C, name='lin_edge')(edge_attr).reshape(
                -1, H, C)

        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n_src - 1)
        dst = jnp.minimum(coo[1], n_dst - 1)

        from ...ops.gat_fused import fused_gat_available, gat_aggregate
        from ...ops.pallas_spmm import _use_pallas
        plain = e is None and not return_attention_weights
        fused_ok = (plain and fused_gat_available(edge_index)
                    and _use_pallas())
        if plain and not fused_ok:
            # single-relation wide-gather attention: one [E, 2HC]
            # gather + alpha-only custom VJP; past the wide cap the
            # online-softmax flash scan bounds memory to one edge
            # chunk (ops/edge_attention.py) — the autodiff path below
            # keeps three [E, H, C] residuals
            from ...ops.edge_attention import hetero_edge_attention_multi
            valid = (coo[0] < n_src) & (coo[1] < n_dst)
            if edge_mask is not None:
                valid = valid & edge_mask
            d_eff = jnp.where(valid, dst, n_dst)
            p = jnp.full((H,), 1.0 / jnp.sqrt(C))
            out = hetero_edge_attention_multi(
                [k], [v], q, [p], [src], [d_eff], n_dst)
        elif fused_ok:
            alpha = (q[dst] * k[src]).sum(-1) / jnp.sqrt(C)   # [E, H]
            # one MXU pass for softmax numerator + denominator
            out = gat_aggregate(edge_index, alpha, v, edge_mask=edge_mask)
        else:
            k_j = k[src]
            if e is not None:
                k_j = k_j + e
            alpha = (q[dst] * k_j).sum(-1) / jnp.sqrt(C)      # [E, H]
            alpha = self.edge_softmax(alpha, dst, n_dst, edge_mask)
            msg = v[src]
            if e is not None:
                msg = msg + e
            msg = msg * alpha[..., None]
            if edge_mask is not None:
                msg = jnp.where(edge_mask[:, None, None], msg, 0)
            from ...ops import scatter
            out = scatter(msg.reshape(-1, H * C), dst, n_dst, 'sum',
                          mask=edge_mask)
            out = out.reshape(n_dst, H, C)

        if self.concat:
            out = out.reshape(n_dst, H * C)
        else:
            out = out.mean(1)

        if self.root_weight:
            x_r = fnn.Dense(out.shape[-1], name='lin_skip')(x_dst)
            if self.beta:
                b = fnn.Dense(1, use_bias=False, name='lin_beta')(
                    jnp.concatenate([out, x_r, out - x_r], -1))
                b = fnn.sigmoid(b)
                out = b * x_r + (1 - b) * out
            else:
                out = out + x_r
        if return_attention_weights:
            return out, (coo, alpha)
        return out
