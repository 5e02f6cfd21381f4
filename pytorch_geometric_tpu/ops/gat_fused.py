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

from .pallas_spmm import segment_sum_blocked


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
    if edge_mask is not None:
        logits = jnp.where(edge_mask[:, None], logits, -jnp.inf)
    # per-dst max, gradient-free (softmax is shift invariant)
    dst_ok = jnp.minimum(coo_dst, num_dst - 1)
    m = jax.lax.stop_gradient(
        jax.ops.segment_max(jnp.where((coo_dst < num_dst)[:, None],
                                      logits, -jnp.inf),
                            dst_ok, num_dst))
    m = jnp.where(jnp.isfinite(m), m, 0)
    p = jnp.exp(logits - m[dst_ok])
    p = jnp.where((coo_dst < num_dst)[:, None], p, 0)
    if edge_mask is not None:
        p = jnp.where(edge_mask[:, None], p, 0)
    # original-order -> blocked-slot order
    p_pad = jnp.concatenate([p, jnp.zeros((1, p.shape[1]), p.dtype)])
    slot_ids = jnp.minimum(blk.perm, e)
    p_slot = p_pad[slot_ids]
    if numerator_scale is not None:
        sc_pad = jnp.concatenate(
            [numerator_scale,
             jnp.zeros((1, numerator_scale.shape[1]),
                       numerator_scale.dtype)])
        p_u = p_slot * sc_pad[slot_ids]
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
