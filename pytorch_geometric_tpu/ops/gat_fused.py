"""Fused attention aggregation (the TPU answer to the reference's
``FusedGATConv`` / dgNN kernels, ``nn/conv/fused_gat_conv.py:12``).

GAT's hot path is ``softmax_per_dst(logits) -> weighted segment-sum``.
On TPU the XLA lowering of that path is scatter-bound: at H=4 heads over
2M edges, segment_max fwd ~34ms, its backward ~43ms, segment_sum fwd
~34ms (v5e measurements) — all for ~32MB of traffic. This module fuses
the numerator and denominator into ONE blocked Pallas segment-sum
(`ops/pallas_spmm.py` MXU kernel) over the per-edge features
``[p | p * v[src]]``:

    out[n] = (sum_e p_e * v[src_e]) / (sum_e p_e),   p = exp(l - m[dst])

The max subtraction uses ``stop_gradient`` — softmax is invariant to the
per-segment constant, so its true gradient contribution is zero and the
expensive scatter-max backward is skipped entirely.

Backward runs grad_v through the cached transpose blocked layout (same
MXU kernel over src-sorted chunks) and grad_p as pure gathers.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_spmm import segment_max_blocked, segment_sum_blocked


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _slot_gather(x, fill_row, slots, inv_pos, e):
    """Reorder per-edge data into blocked slots. The backward is the
    INVERSE-permutation gather (host-precomputed ``inv_pos``), avoiding
    the XLA scatter a plain gather's transpose would lower to."""
    x_pad = jnp.concatenate([x, fill_row[None, :]], 0)
    return x_pad[jnp.minimum(slots, e)]


def _slot_gather_fwd(x, fill_row, slots, inv_pos, e):
    return _slot_gather(x, fill_row, slots, inv_pos, e), inv_pos


def _slot_gather_bwd(e, inv_pos, g):
    # inv_pos == len(g) marks COO pad edges excluded from the blocked
    # layout — their gradient is zero, not slot 0's (edge_index.py
    # _link_blocked_pair sentinel)
    in_layout = inv_pos < g.shape[0]
    grad_x = jnp.where(in_layout[:, None],
                       g[jnp.minimum(inv_pos, g.shape[0] - 1)], 0)
    zf = jnp.zeros((g.shape[1],), g.dtype)
    zeros_i = np.zeros(inv_pos.shape, jax.dtypes.float0)
    return grad_x, zf, np.zeros(g.shape[:1], jax.dtypes.float0), zeros_i


_slot_gather.defvjp(_slot_gather_fwd, _slot_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gat_mix(p_s, p_u, v, meta, num_dst, num_src):
    """su[n] = sum over blocked slots of ``[p_s | p_u * v[src]]``.

    ``p_s`` weights the denominator columns, ``p_u`` the numerator —
    they differ only under attention dropout (dropout scales the
    numerator but the softmax normalizer keeps the full sum).
    p_s, p_u: [E_pad, H]; v: [N_src, H, F];
    meta = (src, dst, chunk_base, t_src, t_dst, t_chunk_base, t_pos).
    Returns [num_dst, H + H*F] (s columns first, then u).
    """
    src, dst, chunk_base = meta[0], meta[1], meta[2]
    e_pad, h = p_s.shape
    f = v.shape[-1]
    # 2D gather (3D-operand gathers lower poorly on TPU) and tail-concat
    # (axis-2 concat interleaves columns -> layout shuffle)
    v_g = v.reshape(num_src, h * f)[jnp.minimum(src, num_src - 1)]
    v_g = jnp.where((src < num_src)[:, None], v_g, 0)
    pv = (v_g.reshape(e_pad, h, f) * p_u[:, :, None]).reshape(
        e_pad, h * f)
    su = segment_sum_blocked(jnp.concatenate([p_s, pv], axis=1),
                             (dst, chunk_base), num_dst)
    return su  # [num_dst, h + h*f]: s columns first, then u


def _gat_mix_fwd(p_s, p_u, v, meta, num_dst, num_src):
    return _gat_mix(p_s, p_u, v, meta, num_dst, num_src), (p_u, v, meta)


def _gat_mix_bwd(num_dst, num_src, res, g):
    p_u, v, meta = res
    src, dst, chunk_base, t_src, t_dst, t_chunk_base, t_pos = meta
    e_pad, h = p_u.shape
    f = v.shape[-1]
    gs = g[:, :h]                                  # [N_dst, H]
    gu = g[:, h:]                                  # [N_dst, H*F]
    v2 = v.reshape(num_src, h * f)
    dsafe = jnp.minimum(dst, num_dst - 1)
    ssafe = jnp.minimum(src, num_src - 1)
    valid = ((dst < num_dst) & (src < num_src))[:, None]
    # grad_p_s[e] = gs[dst_e];  grad_p_u[e] = <gu[dst_e], v[src_e]>
    grad_p_s = jnp.where(valid, gs[dsafe], 0)
    prod = (gu[dsafe].reshape(e_pad, h, f)
            * v2[ssafe].reshape(e_pad, h, f)).sum(-1)
    grad_p_u = jnp.where(valid, prod, 0)
    # grad_v[s] = sum_e p_u * gu[dst_e]  — via the transpose blocked
    # layout so the scatter is an MXU segment-sum, not an XLA scatter
    p_t = p_u[t_pos]
    gu_t = gu[jnp.minimum(t_src, num_dst - 1)]
    featp = (gu_t.reshape(-1, h, f) * p_t[:, :, None]).reshape(-1, h * f)
    featp = jnp.where((t_src < num_dst)[:, None], featp, 0)
    grad_v = segment_sum_blocked(featp, (t_dst, t_chunk_base), num_src)
    zeros = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), meta)
    return grad_p_s, grad_p_u, grad_v.reshape(num_src, h, f), zeros


_gat_mix.defvjp(_gat_mix_fwd, _gat_mix_bwd)


def fused_gat_available(edge_index) -> bool:
    return (getattr(edge_index, 'blocked', None) is not None
            and getattr(edge_index, 'blocked_t', None) is not None)


def gat_aggregate(edge_index, logits: jnp.ndarray, v: jnp.ndarray,
                  edge_mask: Optional[jnp.ndarray] = None,
                  numerator_scale: Optional[jnp.ndarray] = None,
                  return_alpha_sum: bool = False):
    """Softmax-weighted multi-head aggregation over ``dst``.

    logits: [E, H] raw attention logits in ORIGINAL edge order;
    v: [N_src, H, F] per-head values. Returns [N_dst, H, F]
    (and the softmax denominator [N_dst, H] if requested).
    Requires ``edge_index.fill_cache(blocked=True)``.
    """
    blk = edge_index.blocked
    blk_t = edge_index.blocked_t
    num_dst = edge_index.num_dst_nodes
    num_src = edge_index.num_src_nodes
    e = logits.shape[0]
    coo_dst = edge_index.coo[1]
    invalid = coo_dst >= num_dst
    if edge_mask is not None:
        invalid = invalid | ~edge_mask
    logits = jnp.where(invalid[:, None], -jnp.inf, logits)
    h = logits.shape[1]
    neg = jnp.full((h,), -jnp.inf, logits.dtype)
    # reorder to blocked slots once; everything downstream (max kernel,
    # exp, mix kernel) runs in slot order — no original-order scatters
    l_slot = _slot_gather(logits, neg, blk.perm, blk.inv_pos, e)
    # per-dst stabilizer via the MXU sum kernel: softmax is invariant
    # to ANY per-segment constant, and the log-sum-exp bound
    # m = G + log(sum exp(l - G)) sits in [max, max + log deg] — exact
    # stability without a scatter-max (which XLA lowers ~4x slower than
    # the blocked segment-sum)
    ls = jax.lax.stop_gradient(l_slot)
    G = jnp.max(jnp.where(jnp.isfinite(ls), ls, -jnp.inf), axis=0)
    G = jnp.where(jnp.isfinite(G), G, 0.0)
    z = jnp.exp(jnp.maximum(ls - G, -85.0))
    z = jnp.where(jnp.isfinite(ls), z, 0.0)
    s0 = segment_sum_blocked(z, (blk.dst, blk.chunk_base), num_dst)
    m = jnp.where(s0 > 0, G + jnp.log(jnp.maximum(s0, 1e-38)),
                  G - 85.0)
    m = jax.lax.stop_gradient(m)
    dsafe = jnp.minimum(blk.dst, num_dst - 1)
    p_slot = jnp.exp(l_slot - m[dsafe])          # -inf slots -> 0
    p_slot = jnp.where((blk.dst < num_dst)[:, None], p_slot, 0)
    if numerator_scale is not None:
        zero = jnp.zeros((numerator_scale.shape[1],),
                         numerator_scale.dtype)
        p_u = p_slot * _slot_gather(numerator_scale, zero, blk.perm,
                                    blk.inv_pos, e)
    else:
        p_u = p_slot
    meta = (blk.src, blk.dst, blk.chunk_base, blk_t.src, blk_t.dst,
            blk_t.chunk_base, blk_t.t_pos)
    su = _gat_mix(p_slot, p_u, v, meta, num_dst, num_src)
    h, f = logits.shape[1], v.shape[-1]
    s = su[:, :h]
    u = su[:, h:].reshape(num_dst, h, f)
    out = u / jnp.maximum(s, 1e-16)[:, :, None]
    if return_alpha_sum:
        return out, s
    return out
