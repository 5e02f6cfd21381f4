"""Pallas TPU kernels: MXU segment-sum and CSR SpMM.

The north-star kernel from SURVEY.md (reference
``torch.ops.torch_sparse.spmm_sum`` at ``edge_index.py:1798`` and its
autograd at ``:1815-1897``): ``out[dst] = sum_e w_e * x[src_e]`` over
dst-sorted edges.

TPU-native design — **segment reduction as matmul**: edges are chunked
(``BE`` per chunk); within a chunk, destinations fall in a window of
``BN`` node ids starting at the chunk's first dst (dst-sorted input, so
windows advance monotonically). The scatter becomes
``onehot(local_dst)^T @ msg`` — a ``[BN, BE] x [BE, BF]`` MXU matmul —
plus a small XLA epilogue adding per-chunk partials into the output
(``BE/BN``x fewer scattered rows than edge-level scatter). Edges whose
dst escapes the window (node-id gaps in ultra-sparse regions) fall back
to an XLA ``segment_sum``; after locality-preserving node ordering
(ClusterData / Partitioner) their count is ~0.

Backward of the segment-sum is a gather (``g[dst]``); the backward of
the feature gather in ``csr_spmm`` is XLA's scatter-add over the cached
transpose orientation (the reference caches ``_T_perm`` the same way,
``edge_index.py:1780``).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BE = 1024   # edges per chunk
BN = 128    # node-id window per chunk (MXU lane dim)
BF = 128    # feature tile
BG = 8      # chunks per grid step (amortises grid/DMA overhead)


def _use_pallas() -> bool:
    import os
    from .. import backend
    if backend.use_pallas_spmm is not None:
        return bool(backend.use_pallas_spmm)
    if os.environ.get('PGT_DISABLE_PALLAS'):
        return False
    if os.environ.get('PGT_FORCE_PALLAS'):
        return True
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


def _interpret() -> bool:
    # interpret mode whenever the kernel path is active on a non-TPU
    # backend (tests force it on CPU via env or the backend knob)
    try:
        return jax.default_backend() not in ('tpu', 'axon')
    except Exception:
        return True


def _precision():
    """MXU input precision for the one-hot matmul. HIGHEST (exact f32)
    by default — the kernel is bandwidth-bound, so exactness costs only
    ~3% on the GCN train step (A/B'd on v5e: 2.52s vs 2.44s / 200
    steps); set PGT_PALLAS_PRECISION=default for TF32-style rounding
    (~1e-3 relative error)."""
    import os
    if os.environ.get('PGT_PALLAS_PRECISION', '').lower() == 'default':
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _chunk_kernel(msg_ref, local_ref, out_ref):
    """partials = onehot(local)^T @ msg for BG chunks per grid step.

    msg_ref:   [BG, BE, BF]; local_ref: [BG, 1, BE];
    out_ref:   [BG, BN, BF]
    """
    prec = _precision()
    cols = jax.lax.broadcasted_iota(jnp.int32, (BE, BN), 1)
    for g in range(BG):
        local = local_ref[g, 0, :]
        # bf16 messages stream HBM->VMEM at half the traffic and are
        # widened on-chip (Mosaic rejects a bf16 one-hot LHS)
        onehot = (cols == local[:, None]).astype(jnp.float32)
        out_ref[g, :, :] = jax.lax.dot_general(
            onehot, msg_ref[g, :, :].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_sorted(msg: jnp.ndarray, dst: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """Sorted segment-sum; MXU-windowed Pallas on TPU, XLA elsewhere."""
    return _seg_fwd_impl(msg, dst, num_segments)


def _seg_fwd_impl(msg, dst, num_segments):
    if not _use_pallas():
        return jax.ops.segment_sum(msg, dst, num_segments,
                                   indices_are_sorted=True)
    return _segment_sum_mxu(msg, dst, num_segments, _interpret())


def _segment_sum_mxu(msg, dst, num_segments, interpret):
    from jax.experimental import pallas as pl

    e, f = msg.shape
    e_pad = ((max(e, 1) + BE - 1) // BE) * BE
    f_pad = ((max(f, 1) + BF - 1) // BF) * BF
    c = e_pad // BE
    msg_p = jnp.pad(msg.astype(jnp.float32),
                    ((0, e_pad - e), (0, f_pad - f)))
    dst_p = jnp.pad(dst.astype(jnp.int32), (0, e_pad - e),
                    constant_values=np.int32(2 ** 30))

    chunk_dst = dst_p.reshape(c, BE)
    first = chunk_dst[:, :1]
    local = chunk_dst - first
    in_window = (local >= 0) & (local < BN) & (chunk_dst < num_segments)
    local_masked = jnp.where(in_window, local, BN).astype(jnp.int32)

    cg = ((c + BG - 1) // BG) * BG
    msg_g = jnp.pad(msg_p.reshape(c, BE, f_pad),
                    ((0, cg - c), (0, 0), (0, 0)))
    loc_g = jnp.pad(local_masked.reshape(c, 1, BE),
                    ((0, cg - c), (0, 0), (0, 0)),
                    constant_values=np.int32(BN))
    partials = pl.pallas_call(
        _chunk_kernel,
        out_shape=jax.ShapeDtypeStruct((cg, BN, f_pad), jnp.float32),
        grid=(cg // BG, f_pad // BF),
        in_specs=[
            pl.BlockSpec((BG, BE, BF), lambda i, j: (i, 0, j)),
            pl.BlockSpec((BG, 1, BE), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BG, BN, BF), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(msg_g, loc_g)[:c]

    row_ids = first + jnp.arange(BN, dtype=jnp.int32)[None, :]
    row_ids = jnp.clip(row_ids, 0, num_segments)
    out = jax.ops.segment_sum(
        partials.reshape(c * BN, f_pad), row_ids.reshape(-1),
        num_segments + 1)[:num_segments, :f]

    # overflow (escaped-window) edges via XLA
    flat_in = in_window.reshape(-1)[:e]
    ov_dst = jnp.where(flat_in, num_segments, dst)
    out_ov = jax.ops.segment_sum(msg, ov_dst, num_segments + 1)
    return (out + out_ov[:num_segments]).astype(msg.dtype)


def _seg_fwd(msg, dst, num_segments):
    return _seg_fwd_impl(msg, dst, num_segments), dst


def _seg_bwd(num_segments, dst, g):
    safe = jnp.minimum(dst, num_segments - 1)
    grad_msg = jnp.where((dst < num_segments)[:, None], g[safe], 0)
    return (grad_msg, np.zeros(dst.shape, jax.dtypes.float0))


segment_sum_sorted.defvjp(_seg_fwd, _seg_bwd)


def csr_spmm(x: jnp.ndarray, src_sorted: jnp.ndarray,
             dst_sorted: jnp.ndarray,
             weight_sorted: Optional[jnp.ndarray],
             num_dst: int) -> jnp.ndarray:
    """out[d] = sum w * x[s] over dst-sorted edges."""
    msg = x[src_sorted]
    if weight_sorted is not None:
        msg = msg * weight_sorted[:, None]
    return segment_sum_sorted(msg, dst_sorted, num_dst)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_blocked(msg: jnp.ndarray, blk_meta,
                        num_segments: int) -> jnp.ndarray:
    """Blocked-layout segment-sum: ``blk_meta = (dst, chunk_base)`` from
    ``EdgeIndex.blocked`` — every chunk's dst ids are inside one BN
    window by construction, so there is NO overflow fallback pass."""
    return _seg_blocked_impl(msg, blk_meta, num_segments)


def _seg_blocked_impl(msg, blk_meta, num_segments):
    dst, chunk_base = blk_meta
    if not _use_pallas():
        return jax.ops.segment_sum(msg, dst, num_segments)
    from jax.experimental import pallas as pl

    e_pad, f = msg.shape
    c = e_pad // BE
    f_pad = ((max(f, 1) + BF - 1) // BF) * BF
    dt = jnp.bfloat16 if msg.dtype == jnp.bfloat16 else jnp.float32
    msg_p = (jnp.pad(msg, ((0, 0), (0, f_pad - f)))
             if f_pad != f else msg).astype(dt)
    local = dst.reshape(c, BE) - chunk_base[:, None]
    local = jnp.where((local >= 0) & (local < BN), local,
                      BN).astype(jnp.int32)

    cg = ((c + BG - 1) // BG) * BG
    msg_g = jnp.pad(msg_p.reshape(c, BE, f_pad),
                    ((0, cg - c), (0, 0), (0, 0)))
    loc_g = jnp.pad(local.reshape(c, 1, BE),
                    ((0, cg - c), (0, 0), (0, 0)),
                    constant_values=np.int32(BN))
    partials = pl.pallas_call(
        _chunk_kernel,
        out_shape=jax.ShapeDtypeStruct((cg, BN, f_pad), jnp.float32),
        grid=(cg // BG, f_pad // BF),
        in_specs=[
            pl.BlockSpec((BG, BE, BF), lambda i, j: (i, 0, j)),
            pl.BlockSpec((BG, 1, BE), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BG, BN, BF), lambda i, j: (i, 0, j)),
        interpret=_interpret(),
    )(msg_g, loc_g)[:c]

    row_ids = chunk_base[:, None] + jnp.arange(BN, dtype=jnp.int32)
    row_ids = jnp.clip(row_ids, 0, num_segments)
    out = jax.ops.segment_sum(
        partials.reshape(c * BN, f_pad), row_ids.reshape(-1),
        num_segments + 1)[:num_segments, :f]
    return out.astype(msg.dtype)


def _seg_blocked_fwd(msg, blk_meta, num_segments):
    return _seg_blocked_impl(msg, blk_meta, num_segments), blk_meta


def _seg_blocked_bwd(num_segments, blk_meta, g):
    dst, chunk_base = blk_meta
    safe = jnp.minimum(dst, num_segments - 1)
    grad_msg = jnp.where((dst < num_segments)[:, None], g[safe], 0)
    zeros = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), blk_meta)
    return grad_msg, zeros


segment_sum_blocked.defvjp(_seg_blocked_fwd, _seg_blocked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _spmm_blocked(x, w_slot, meta, num_dst, num_src):
    """Fused SpMM over the blocked layout with a blocked backward.

    meta = (src, dst, chunk_base, t_src, t_dst, t_chunk_base, t_perm_pos)
    where the ``t_*`` arrays describe the transpose (src-sorted blocked)
    orientation and ``t_perm_pos`` maps each transpose slot to the
    position of the same edge in the forward blocked layout.
    """
    src, dst, chunk_base = meta[0], meta[1], meta[2]
    msg = x[src] * w_slot[:, None]
    return segment_sum_blocked(msg, (dst, chunk_base), num_dst)


def _spmm_blocked_fwd(x, w_slot, meta, num_dst, num_src):
    return _spmm_blocked(x, w_slot, meta, num_dst, num_src), \
        (x, w_slot, meta)


def _spmm_blocked_bwd(num_dst, num_src, res, g):
    x, w_slot, meta = res
    (src, dst, chunk_base, t_src, t_dst, t_chunk_base,
     t_perm_pos) = meta
    # grad_x[s] = sum_e w_e * g[dst_e] over src-sorted (transpose)
    # blocked edges — the reference's cached-transpose backward
    # (edge_index.py:1849), here through the same MXU kernel.
    w_t = w_slot[t_perm_pos]
    gm = g[jnp.minimum(t_src, num_dst - 1)] * w_t[:, None]
    gm = jnp.where((t_src < num_dst)[:, None], gm, 0)
    grad_x = segment_sum_blocked(gm, (t_dst, t_chunk_base), num_src)
    # grad_w per forward slot = x[src] . g[dst]
    gsafe = g[jnp.minimum(dst, num_dst - 1)]
    grad_w = jnp.where(dst < num_dst,
                       (x[src] * gsafe).sum(-1), 0.0)
    zeros = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), meta)
    return grad_x, grad_w, zeros


_spmm_blocked.defvjp(_spmm_blocked_fwd, _spmm_blocked_bwd)


def spmm_pallas(edge_index, x: jnp.ndarray,
                edge_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SpMM entry over an EdgeIndex.

    Uses the node-blocked layout (``fill_cache()``) when present — both
    forward and backward run through the MXU kernel; otherwise falls
    back to the windowed dst-sorted path.
    """
    blk = getattr(edge_index, 'blocked', None)
    blk_t = getattr(edge_index, 'blocked_t', None)
    if blk is not None and blk_t is not None:
        e = edge_index.num_edges
        if edge_weight is not None:
            w_pad = jnp.concatenate([edge_weight,
                                     jnp.zeros((1,),
                                               edge_weight.dtype)])
        else:
            w_pad = jnp.concatenate(
                [jnp.ones((e,), x.dtype), jnp.zeros((1,), x.dtype)])
        w_slot = w_pad[jnp.minimum(blk.perm, e)]
        # transpose-slot -> forward-slot map (host-precomputed at
        # fill_cache time — rebuilding it per call costs an XLA scatter)
        t_perm_pos = blk_t.t_pos
        meta = (blk.src, blk.dst, blk.chunk_base, blk_t.src, blk_t.dst,
                blk_t.chunk_base, t_perm_pos)
        return _spmm_blocked(x, w_slot, meta,
                             edge_index.num_dst_nodes,
                             edge_index.num_src_nodes)
    csc = edge_index.get_csc()          # sorted by dst; indices = src
    dst_sorted = edge_index.col[csc.perm]
    src_sorted = csc.indices
    w_sorted = (edge_weight[csc.perm]
                if edge_weight is not None else None)
    return csr_spmm(x, src_sorted, dst_sorted, w_sorted,
                    edge_index.num_dst_nodes)


def _chunk_max_kernel(val_ref, local_ref, out_ref):
    """Per-chunk masked segment-MAX: out[g, n, h] = max over edges e in
    chunk g with local dst n of val[g, e, h] (-inf where none).

    val_ref: [BG, BE, BH]; local_ref: [BG, 1, BE]; out_ref: [BG, BN, BH].
    VPU-only (max has no MXU form); BH is the padded head dim.
    """
    bh = val_ref.shape[-1]
    neg = jnp.float32(-3.4e38)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BN, BE), 0)
    for g in range(BG):
        local = local_ref[g, 0, :]                      # [BE]
        # f32 mask (Mosaic only supports minor-dim insertion on 32-bit)
        onehot = (rows == local[None, :]).astype(jnp.float32)
        acc = jnp.full((BN, bh), neg, jnp.float32)
        vals = val_ref[g, :, :]                         # [BE, BH]
        # max over edges via a masked broadcast reduce in BE slabs
        # (full [BN, BE, BH] would blow VMEM at BH=128)
        SLAB = 32
        for s in range(BE // SLAB):
            sl = slice(s * SLAB, (s + 1) * SLAB)
            oh = onehot[:, sl][:, :, None]              # [BN, SLAB, 1]
            m = oh * vals[sl][None, :, :] + (1.0 - oh) * neg
            acc = jnp.maximum(acc, m.max(axis=1))
        out_ref[g, :, :] = acc


def segment_max_blocked(vals: jnp.ndarray, blk_meta,
                        num_segments: int) -> jnp.ndarray:
    """Blocked-layout segment-max over [E_pad, H] values; returns
    [num_segments, H] with -inf for empty segments. Gradient-free by
    design (used for the softmax stabilizer under stop_gradient)."""
    dst, chunk_base = blk_meta
    if not _use_pallas():
        safe = jnp.minimum(dst, num_segments - 1)
        v = jnp.where((dst < num_segments)[:, None], vals, -jnp.inf)
        return jax.ops.segment_max(v, safe, num_segments)
    from jax.experimental import pallas as pl

    e_pad, h = vals.shape
    c = e_pad // BE
    h_pad = ((max(h, 1) + BF - 1) // BF) * BF
    # clamp -inf to a finite sentinel: the kernel's arithmetic select
    # would produce NaN from 0 * -inf
    v = jnp.maximum(vals.astype(jnp.float32), -3.4e38)
    if h_pad != h:
        v = jnp.pad(v, ((0, 0), (0, h_pad - h)),
                    constant_values=-3.4e38)
    local = dst.reshape(c, BE) - chunk_base[:, None]
    local = jnp.where((local >= 0) & (local < BN), local,
                      BN).astype(jnp.int32)
    cg = ((c + BG - 1) // BG) * BG
    v_g = jnp.pad(v.reshape(c, BE, h_pad), ((0, cg - c), (0, 0), (0, 0)),
                  constant_values=-3.4e38)
    loc_g = jnp.pad(local.reshape(c, 1, BE),
                    ((0, cg - c), (0, 0), (0, 0)),
                    constant_values=np.int32(BN))
    partials = pl.pallas_call(
        _chunk_max_kernel,
        out_shape=jax.ShapeDtypeStruct((cg, BN, h_pad), jnp.float32),
        grid=(cg // BG, h_pad // BF),
        in_specs=[
            pl.BlockSpec((BG, BE, BF), lambda i, j: (i, 0, j)),
            pl.BlockSpec((BG, 1, BE), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BG, BN, BF), lambda i, j: (i, 0, j)),
        interpret=_interpret(),
    )(v_g, loc_g)[:c]
    row_ids = chunk_base[:, None] + jnp.arange(BN, dtype=jnp.int32)
    row_ids = jnp.clip(row_ids, 0, num_segments)
    out = jax.ops.segment_max(
        partials.reshape(c * BN, h_pad), row_ids.reshape(-1),
        num_segments + 1)[:num_segments, :h]
    return jnp.where(out <= -3e38, -jnp.inf, out)
