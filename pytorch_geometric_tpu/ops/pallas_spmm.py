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


def _use_pallas() -> bool:
    import os
    if os.environ.get('PGT_DISABLE_PALLAS'):
        return False
    if os.environ.get('PGT_FORCE_PALLAS'):
        return True
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


def _interpret() -> bool:
    import os
    if os.environ.get('PGT_FORCE_PALLAS'):
        return jax.default_backend() not in ('tpu', 'axon')
    return False


def _chunk_kernel(msg_ref, local_ref, out_ref):
    """partials = onehot(local)^T @ msg for one (chunk, feature tile).

    msg_ref:   [1, BE, BF]; local_ref: [1, BE, 1]; out_ref: [1, BN, BF]
    """
    local = local_ref[0, :, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (BE, BN), 1)
    onehot = (cols == local[:, None]).astype(jnp.float32)
    out_ref[0, :, :] = jax.lax.dot_general(
        onehot, msg_ref[0, :, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


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

    partials = pl.pallas_call(
        _chunk_kernel,
        out_shape=jax.ShapeDtypeStruct((c, BN, f_pad), jnp.float32),
        grid=(c, f_pad // BF),
        in_specs=[
            pl.BlockSpec((1, BE, BF), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, BE, 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BN, BF), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(msg_p.reshape(c, BE, f_pad), local_masked.reshape(c, BE, 1))

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


def spmm_pallas(edge_index, x: jnp.ndarray,
                edge_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SpMM entry over an EdgeIndex (uses the cached CSC orientation)."""
    csc = edge_index.get_csc()          # sorted by dst; indices = src
    dst_sorted = edge_index.col[csc.perm]
    src_sorted = csc.indices
    w_sorted = (edge_weight[csc.perm]
                if edge_weight is not None else None)
    return csr_spmm(x, src_sorted, dst_sorted, w_sorted,
                    edge_index.num_dst_nodes)
