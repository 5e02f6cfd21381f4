"""Public SDDMM + fused segment-softmax primitives.

The kernel pair behind every edge-attention layer (reference boundary:
``pyg_lib.ops.softmax_csr`` used by ``torch_geometric/utils/_softmax.py:58``
and the dgNN fused kernels behind ``FusedGATConv``):

* :func:`sddmm` — sampled dense-dense matmul: per-edge (multi-head) dot
  scores ``<a[src_e], b[dst_e]>`` without materialising the dense
  product.
* :func:`edge_softmax` — segment softmax over destination, returning
  per-edge coefficients in ORIGINAL edge order. Dispatches the
  denominator through the blocked Pallas MXU segment-sum when the
  ``EdgeIndex`` carries a blocked cache.
* :func:`edge_softmax_aggregate` — the fully fused path for PER-EDGE
  values (RGAT / HGT / HEAT style, where the message depends on the
  edge, not just the source node): softmax numerator + denominator in
  one blocked segment-sum over ``[p | p * v]``; every backward operand
  is a gather.
* :func:`multi_relation_softmax_aggregate` — HGT's union softmax:
  per-relation blocked kernels composed with a shared stabilizer so the
  normalisation spans ALL incoming relations of a destination.

Per-node-value attention (GAT family) lives in :mod:`ops.gat_fused`
(``gat_aggregate``); this module is the general-edge complement.
"""

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gat_fused import _slot_gather, fused_gat_available
from .pallas_spmm import _use_pallas, segment_sum_blocked


def sddmm(edge_index, a: jnp.ndarray, b: jnp.ndarray,
          edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-edge dot scores ``out[e] = <a[src_e], b[dst_e]>``.

    a: [N_src, H, F] (or [N_src, F] -> implicit H=1); b likewise.
    Returns [E, H]. Masked / padded edges score 0.
    """
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, None, :]
        b = b[:, None, :]
    n_src, n_dst = a.shape[0], b.shape[0]
    src = jnp.minimum(coo[0], n_src - 1)
    dst = jnp.minimum(coo[1], n_dst - 1)
    out = (a[src] * b[dst]).sum(-1)
    valid = (coo[0] < n_src) & (coo[1] < n_dst)
    if edge_mask is not None:
        valid = valid & edge_mask
    out = jnp.where(valid[:, None], out, 0)
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# fused per-edge-value mix: su[n] = sum_slots [p_s | p_u * v]
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _edge_mix(p_s, p_u, v_slot, meta, num_dst):
    """p_s, p_u: [E_pad, H]; v_slot: [E_pad, H, F] (slot order).
    Returns [num_dst, H + H*F] (denominator columns first)."""
    dst, chunk_base = meta
    e_pad, h = p_s.shape
    f = v_slot.shape[-1]
    pv = (v_slot * p_u[:, :, None]).reshape(e_pad, h * f)
    return segment_sum_blocked(jnp.concatenate([p_s, pv], axis=1),
                               (dst, chunk_base), num_dst)


def _edge_mix_fwd(p_s, p_u, v_slot, meta, num_dst):
    return _edge_mix(p_s, p_u, v_slot, meta, num_dst), (p_u, v_slot, meta)


def _edge_mix_bwd(num_dst, res, g):
    p_u, v_slot, meta = res
    dst, chunk_base = meta
    e_pad, h = p_u.shape
    f = v_slot.shape[-1]
    gs = g[:, :h]
    gu = g[:, h:].reshape(num_dst, h, f)
    dsafe = jnp.minimum(dst, num_dst - 1)
    valid = (dst < num_dst)[:, None]
    # all three grads are gathers — no scatters anywhere in the backward
    grad_p_s = jnp.where(valid, gs[dsafe], 0)
    gu_e = gu[dsafe]
    grad_p_u = jnp.where(valid, (gu_e * v_slot).sum(-1), 0)
    grad_v = jnp.where(valid[:, :, None], gu_e * p_u[:, :, None], 0)
    zeros = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), meta)
    return grad_p_s, grad_p_u, grad_v, zeros


_edge_mix.defvjp(_edge_mix_fwd, _edge_mix_bwd)


def _softmax_parts(edge_index, logits, edge_mask, shared_g=None):
    """Slot-order exp weights + raw denominator for one relation.

    Returns (p_slot [E_pad,H] = exp(l - G), s0 [N_dst,H], G [H], blk).
    With ``shared_g`` the caller supplies the stabilizer (union softmax).
    """
    blk = edge_index.blocked
    num_dst = edge_index.num_dst_nodes
    e = logits.shape[0]
    invalid = edge_index.coo[1] >= num_dst
    if edge_mask is not None:
        invalid = invalid | ~edge_mask
    logits = jnp.where(invalid[:, None], -jnp.inf, logits)
    h = logits.shape[1]
    neg = jnp.full((h,), -jnp.inf, logits.dtype)
    l_slot = _slot_gather(logits, neg, blk.perm, blk.inv_pos, e)
    if shared_g is None:
        ls = jax.lax.stop_gradient(l_slot)
        g = jnp.max(jnp.where(jnp.isfinite(ls), ls, -jnp.inf), axis=0)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        g = jax.lax.stop_gradient(g)
    else:
        g = shared_g
    z = jnp.exp(jnp.maximum(l_slot - g, -85.0))
    z = jnp.where(jnp.isfinite(l_slot), z, 0.0)
    z = jnp.where((blk.dst < num_dst)[:, None], z, 0)
    s0 = segment_sum_blocked(jax.lax.stop_gradient(z),
                             (blk.dst, blk.chunk_base), num_dst)
    return z, s0, g, blk


def edge_softmax_aggregate(edge_index, logits: jnp.ndarray,
                           values: jnp.ndarray,
                           edge_mask: Optional[jnp.ndarray] = None,
                           numerator_scale: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """Fused ``softmax_per_dst(logits) @ values`` for per-EDGE values.

    logits: [E, H]; values: [E, H, F] in original edge order.
    Returns [N_dst, H, F]. Requires a blocked cache
    (``edge_index.fill_cache(blocked=True)``).
    """
    num_dst = edge_index.num_dst_nodes
    e, h = logits.shape
    f = values.shape[-1]
    z, s0, g, blk = _softmax_parts(edge_index, logits, edge_mask)
    # exact per-dst LSE refinement: m = G + log(s0) in [max, max+log deg]
    m = jnp.where(s0 > 0, g + jnp.log(jnp.maximum(s0, 1e-38)), g - 85.0)
    m = jax.lax.stop_gradient(m)
    dsafe = jnp.minimum(blk.dst, num_dst - 1)
    # rebase z from G to m[dst]; stays a pure rescale (no second exp of l)
    p_slot = z * jnp.exp(g - m[dsafe])
    zf = jnp.zeros((h * f,), values.dtype)
    v_slot = _slot_gather(values.reshape(e, h * f), zf, blk.perm,
                          blk.inv_pos, e).reshape(-1, h, f)
    if numerator_scale is not None:
        zs = jnp.zeros((h,), numerator_scale.dtype)
        p_u = p_slot * _slot_gather(numerator_scale, zs, blk.perm,
                                    blk.inv_pos, e)
    else:
        p_u = p_slot
    su = _edge_mix(p_slot, p_u, v_slot, (blk.dst, blk.chunk_base),
                   num_dst)
    s = su[:, :h]
    u = su[:, h:].reshape(num_dst, h, f)
    return u / jnp.maximum(s, 1e-16)[:, :, None]


def multi_relation_softmax_aggregate(
        relations: Sequence[Tuple[object, jnp.ndarray, jnp.ndarray,
                                  Optional[jnp.ndarray]]],
        num_dst: int) -> jnp.ndarray:
    """HGT-style union softmax: normalise across ALL incoming relations.

    relations: list of (edge_index, logits [E_r, H], values [E_r, H, F],
    edge_mask). Every edge_index must target the same destination set
    and carry a blocked cache. Two blocked passes per relation:
    (1) raw denominators under one shared stabilizer, (2) the fused
    ``[p | p*v]`` mix rebased to the union's log-sum-exp.
    """
    # shared stabilizer: global max over every relation's logits
    gs = []
    for (_, logits, _, mask) in relations:
        l = jax.lax.stop_gradient(logits)
        if mask is not None:
            l = jnp.where(mask[:, None], l, -jnp.inf)
        gs.append(jnp.max(l, axis=0))
    g = jnp.max(jnp.stack(gs), axis=0)
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    g = jax.lax.stop_gradient(g)

    parts = []
    s0_total = 0
    for (ei, logits, values, mask) in relations:
        z, s0, _, blk = _softmax_parts(ei, logits, mask, shared_g=g)
        parts.append((z, blk, values, logits.shape, mask, ei))
        s0_total = s0_total + s0
    m = jnp.where(s0_total > 0,
                  g + jnp.log(jnp.maximum(s0_total, 1e-38)), g - 85.0)
    m = jax.lax.stop_gradient(m)

    su_total = 0
    h = relations[0][1].shape[1]
    f = relations[0][2].shape[-1]
    for (z, blk, values, lshape, mask, ei) in parts:
        e = lshape[0]
        dsafe = jnp.minimum(blk.dst, num_dst - 1)
        p_slot = z * jnp.exp(g - m[dsafe])
        zf = jnp.zeros((h * f,), values.dtype)
        v_slot = _slot_gather(values.reshape(e, h * f), zf, blk.perm,
                              blk.inv_pos, e).reshape(-1, h, f)
        su_total = su_total + _edge_mix(p_slot, p_slot, v_slot,
                                        (blk.dst, blk.chunk_base),
                                        num_dst)
    s = su_total[:, :h]
    u = su_total[:, h:].reshape(num_dst, h, f)
    return u / jnp.maximum(s, 1e-16)[:, :, None]


def edge_softmax(edge_index, logits: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Segment softmax by destination, per-edge result in ORIGINAL edge
    order (the ``softmax_csr`` role). Uses the blocked MXU denominator
    when cached; callers without a cache should use :func:`ops.softmax`.
    """
    num_dst = edge_index.num_dst_nodes
    e, h = logits.shape
    z, s0, g, blk = _softmax_parts(edge_index, logits, edge_mask)
    m = jnp.where(s0 > 0, g + jnp.log(jnp.maximum(s0, 1e-38)), g - 85.0)
    m = jax.lax.stop_gradient(m)
    dsafe = jnp.minimum(blk.dst, num_dst - 1)
    p_slot = z * jnp.exp(g - m[dsafe])
    s = segment_sum_blocked(p_slot, (blk.dst, blk.chunk_base), num_dst)
    # back to original edge order: slot lookup via the inverse positions
    p = p_slot[blk.inv_pos]
    denom = s[jnp.minimum(edge_index.coo[1], num_dst - 1)]
    alpha = p / jnp.maximum(denom, 1e-16)
    valid = edge_index.coo[1] < num_dst
    if edge_mask is not None:
        valid = valid & edge_mask
    return jnp.where(valid[:, None], alpha, 0)


def fused_softmax_available(edge_index) -> bool:
    return fused_gat_available(edge_index) and _use_pallas()
