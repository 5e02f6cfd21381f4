"""HeteroConv, HGTConv, HANConv — heterogeneous convolutions.

Reference: ``torch_geometric/nn/conv/hetero_conv.py:29``,
``hgt_conv.py:17``, ``han_conv.py``.
"""

from typing import Any, Dict, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import scatter, softmax as segment_softmax

EdgeType = Tuple[str, str, str]


def _ekey(et: EdgeType) -> str:
    return '__'.join(et)


class HeteroConv(fnn.Module):
    """Dict of per-edge-type convs; dst results grouped by ``aggr``
    (reference ``hetero_conv.py:29``).

    ``convs``: dict mapping edge type -> conv module. Each conv is called
    with ``((x_src, x_dst), edge_index)``.
    """
    convs: Any   # Dict[EdgeType, MessagePassing] (frozen at init)
    aggr: str = 'sum'

    @fnn.compact
    def __call__(self, x_dict: Dict[str, jnp.ndarray],
                 edge_index_dict: Dict[EdgeType, Any],
                 **kwargs_dict) -> Dict[str, jnp.ndarray]:
        import dataclasses
        grouped: Dict[str, list] = {}
        for et, conv in dict(self.convs).items():
            if et not in edge_index_dict:
                continue
            src, _, dst = et
            if src not in x_dict or dst not in x_dict:
                continue
            fields = {f.name: getattr(conv, f.name)
                      for f in dataclasses.fields(type(conv))
                      if f.name not in ('parent', 'name')}
            conv = type(conv)(**fields, name=f'conv_{_ekey(et)}')
            kw = {k: v[et] for k, v in kwargs_dict.items() if et in v}
            out = conv((x_dict[src], x_dict[dst]), edge_index_dict[et],
                       **kw)
            grouped.setdefault(dst, []).append(out)
        result = {}
        for dst, outs in grouped.items():
            if len(outs) == 1:
                result[dst] = outs[0]
            elif self.aggr in ('sum', 'add'):
                result[dst] = sum(outs)
            elif self.aggr == 'mean':
                result[dst] = sum(outs) / len(outs)
            elif self.aggr == 'max':
                result[dst] = jnp.stack(outs).max(0)
            elif self.aggr == 'min':
                result[dst] = jnp.stack(outs).min(0)
            elif self.aggr == 'cat':
                result[dst] = jnp.concatenate(outs, -1)
            else:
                raise ValueError(f"Unknown aggr '{self.aggr}'")
        return result


class HGTConv(fnn.Module):
    """Heterogeneous Graph Transformer (reference ``hgt_conv.py:17``).

    Typed QKV projections (the reference batches them with
    ``HeteroDictLinear`` + ``segment_matmul``; here each type is its own
    MXU GEMM), per-edge-type attention with relation-specific
    transform + prior, edge softmax over all incoming relations, typed
    output projection with skip.

    ``attn_path`` selects the union-softmax aggregation:

    * ``'fused'`` (the plain-COO default) — all relations of a dst type
      collapse into one wide gather from a concatenated [M, H, 2D] K|V
      table and a single custom-VJP softmax+aggregate
      (:func:`ops.edge_attention.hetero_edge_attention`); backward
      saves only alpha, so no ``remat`` is needed at MAG scale.
    * ``'blocked'`` (auto when every relation carries a blocked cache)
      — the Pallas MXU multi-relation kernel (``ops/sddmm.py``).
    * ``'concat'`` — per-relation gathers + one XLA segment softmax
      (the pre-r4 path, kept for A/B and parity tests).
    """
    out_channels: int
    metadata: Tuple[Tuple[str, ...], Tuple[EdgeType, ...]]
    heads: int = 1
    attn_path: Optional[str] = None   # None = auto

    @fnn.compact
    def __call__(self, x_dict: Dict[str, jnp.ndarray],
                 edge_index_dict: Dict[EdgeType, Any],
                 flash_layouts: Optional[Dict[str, Any]] = None
                 ) -> Dict[str, jnp.ndarray]:
        # flash_layouts: per-dst-type host-presorted union edge layouts
        # (ops.edge_attention.build_hgt_flash_layouts) — skips the
        # per-step device argsort on giant graphs
        node_types, edge_types = self.metadata
        H = self.heads
        D = self.out_channels // H
        k_dict, q_dict, v_dict = {}, {}, {}
        for t in node_types:
            if t not in x_dict:
                continue
            x = x_dict[t]
            k_dict[t] = fnn.Dense(H * D, name=f'k_{t}')(x).reshape(-1, H, D)
            q_dict[t] = fnn.Dense(H * D, name=f'q_{t}')(x).reshape(-1, H, D)
            v_dict[t] = fnn.Dense(H * D, name=f'v_{t}')(x).reshape(-1, H, D)

        # group relations by destination type; the softmax spans the
        # union of a destination's incoming edges across ALL relations.
        rels_by_dst: Dict[str, list] = {}
        for et in edge_types:
            src, rel, dst = et
            if (et not in edge_index_dict or src not in k_dict
                    or dst not in q_dict):
                continue
            name = _ekey(et)
            a_rel = self.param(f'a_rel_{name}',
                               fnn.initializers.glorot_uniform(), (H, D, D))
            m_rel = self.param(f'm_rel_{name}',
                               fnn.initializers.glorot_uniform(), (H, D, D))
            p_rel = self.param(f'p_rel_{name}', fnn.initializers.ones, (H,))
            rels_by_dst.setdefault(dst, []).append(
                (src, a_rel, m_rel, p_rel, edge_index_dict[et]))

        out_dict = {}
        type_tok = None   # sequences dst types (see edge_attention._seq)
        for t in node_types:
            if t not in x_dict:
                continue
            n = x_dict[t].shape[0]
            if t not in rels_by_dst:
                out_dict[t] = x_dict[t]
                continue
            from ...ops.sddmm import (fused_softmax_available,
                                      multi_relation_softmax_aggregate)
            rels = rels_by_dst[t]
            path = self.attn_path
            if path is None:
                path = ('blocked'
                        if all(fused_softmax_available(r[4]) for r in rels)
                        else 'fused')
            if flash_layouts is not None and t in flash_layouts:
                path = 'fused'
            if path == 'fused':
                from ...ops.edge_attention import \
                    hetero_edge_attention_multi
                k_tabs, v_tabs, s_parts, d_parts, p_parts = \
                    [], [], [], [], []
                for (src, a_rel, m_rel, p_rel, ei) in rels:
                    coo = ei.coo if hasattr(ei, 'coo') else ei
                    n_src = k_dict[src].shape[0]
                    # relation transform at the NODE level (commutes
                    # with the gather; per-edge application measured
                    # 25% slower on the MAG-shape step)
                    k_tabs.append(
                        jnp.einsum('nhd,hdf->nhf', k_dict[src], a_rel))
                    v_tabs.append(
                        jnp.einsum('nhd,hdf->nhf', v_dict[src], m_rel))
                    valid = (coo[0] < n_src) & (coo[1] < n)
                    s_parts.append(jnp.minimum(coo[0], n_src - 1))
                    d_parts.append(
                        jnp.where(valid, jnp.minimum(coo[1], n - 1), n))
                    p_parts.append(p_rel / jnp.sqrt(D))
                # one wide [E, 2HD] gather when the union transient
                # fits the chip; past PGT_ATTN_WIDE_BYTES the online-
                # softmax flash scan bounds memory to one edge chunk
                # (full-MAG scale). token chains types so their edge
                # transients don't coexist
                agg = hetero_edge_attention_multi(
                    k_tabs, v_tabs, q_dict[t], p_parts, s_parts,
                    d_parts, n, token=type_tok,
                    layout=(None if flash_layouts is None
                            else flash_layouts.get(t)))
                agg = agg.reshape(n, -1)
                type_tok = agg
            else:
                per_rel = []
                for (src, a_rel, m_rel, p_rel, ei) in rels:
                    coo = ei.coo if hasattr(ei, 'coo') else ei
                    n_src = k_dict[src].shape[0]
                    s = jnp.minimum(coo[0], n_src - 1)
                    d = jnp.minimum(coo[1], n - 1)
                    k = jnp.einsum('nhd,hdf->nhf', k_dict[src], a_rel)[s]
                    v = jnp.einsum('nhd,hdf->nhf', v_dict[src], m_rel)[s]
                    q = q_dict[t][d]
                    logit = (q * k).sum(-1) * p_rel / jnp.sqrt(D)  # [E, H]
                    valid = (coo[0] < n_src) & (coo[1] < n)
                    per_rel.append((d, logit, v, valid, ei))
                if path == 'blocked':
                    # union softmax across relations through the blocked
                    # MXU kernel (shared stabilizer; see ops/sddmm.py)
                    agg = multi_relation_softmax_aggregate(
                        [(p[4], p[1], p[2], p[3]) for p in per_rel], n)
                    agg = agg.reshape(n, -1)
                else:   # 'concat'
                    ds = jnp.concatenate([p[0] for p in per_rel])
                    logits = jnp.concatenate([p[1] for p in per_rel])
                    vs = jnp.concatenate([p[2] for p in per_rel])
                    valid = jnp.concatenate([p[3] for p in per_rel])
                    alpha = segment_softmax(logits, ds, n, mask=valid)
                    msg = vs * alpha[..., None]
                    agg = scatter(msg.reshape(msg.shape[0], -1), ds, n,
                                  'sum', mask=valid)
            out = fnn.gelu(agg)
            out = fnn.Dense(self.out_channels, name=f'out_{t}')(out)
            # gated skip (reference hgt_conv.py skip param)
            skip = self.param(f'skip_{t}', fnn.initializers.ones, ())
            beta = jax.nn.sigmoid(skip)
            if x_dict[t].shape[-1] == self.out_channels:
                out = beta * out + (1 - beta) * x_dict[t]
            out_dict[t] = out
        return out_dict


class HANConv(fnn.Module):
    """Heterogeneous attention network (reference ``han_conv.py``):
    per-metapath GAT-style node attention + semantic attention across
    metapaths."""
    out_channels: int
    metadata: Tuple[Tuple[str, ...], Tuple[EdgeType, ...]]
    heads: int = 1
    negative_slope: float = 0.2

    @fnn.compact
    def __call__(self, x_dict: Dict[str, jnp.ndarray],
                 edge_index_dict: Dict[EdgeType, Any]
                 ) -> Dict[str, Optional[jnp.ndarray]]:
        node_types, edge_types = self.metadata
        H = self.heads
        D = self.out_channels // H
        h_dict = {
            t: fnn.Dense(H * D, name=f'proj_{t}')(x).reshape(-1, H, D)
            for t, x in x_dict.items()
        }
        per_dst: Dict[str, list] = {}
        for et in edge_types:
            src, rel, dst = et
            if et not in edge_index_dict or src not in h_dict:
                continue
            name = _ekey(et)
            a_src = self.param(f'att_src_{name}',
                               fnn.initializers.glorot_uniform(), (1, H, D))
            a_dst = self.param(f'att_dst_{name}',
                               fnn.initializers.glorot_uniform(), (1, H, D))
            ei = edge_index_dict[et]
            coo = ei.coo if hasattr(ei, 'coo') else ei
            n_src = h_dict[src].shape[0]
            n_dst = h_dict[dst].shape[0]
            s = jnp.minimum(coo[0], n_src - 1)
            d = jnp.minimum(coo[1], n_dst - 1)
            e_src = (h_dict[src] * a_src).sum(-1)
            e_dst = (h_dict[dst] * a_dst).sum(-1)
            valid = (coo[0] < n_src) & (coo[1] < n_dst)
            import os as _os
            if (coo.shape[1] * H * D * 4
                    > float(_os.environ.get('PGT_ATTN_WIDE_BYTES',
                                            1e9))):
                # giant metapath: online-softmax flash scan (additive
                # leaky_relu logits — same form as GATConv)
                from ...ops.edge_attention import gat_flash_attention
                agg = gat_flash_attention(
                    e_src, e_dst, h_dict[src], s,
                    jnp.where(valid, d, n_dst), n_dst,
                    negative_slope=self.negative_slope)
                agg = agg.reshape(n_dst, -1)
            else:
                logit = fnn.leaky_relu(e_src[s] + e_dst[d],
                                       self.negative_slope)
                alpha = segment_softmax(logit, d, n_dst, mask=valid)
                msg = h_dict[src][s] * alpha[..., None]
                agg = scatter(msg.reshape(msg.shape[0], -1), d, n_dst,
                              'sum', mask=valid)
            per_dst.setdefault(dst, []).append(fnn.relu(agg))

        # semantic attention (reference han_conv.py group()): k_lin and
        # q are SHARED across all node types
        k_lin = fnn.Dense(self.out_channels, name='k_lin')
        q = self.param('q', fnn.initializers.glorot_uniform(),
                       (1, self.out_channels))
        out_dict: Dict[str, Optional[jnp.ndarray]] = {}
        for t in node_types:
            if t not in per_dst:
                out_dict[t] = None
                continue
            outs = jnp.stack(per_dst[t], 0)        # [P, N, F]
            score = (q * fnn.tanh(k_lin(outs)).mean(1)).sum(-1)  # [P]
            beta = jax.nn.softmax(score)
            out_dict[t] = jnp.einsum('p,pnf->nf', beta, outs)
        return out_dict
