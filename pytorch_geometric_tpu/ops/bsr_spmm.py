"""Block-sparse (BSR) adjacency SpMM — Pallas MXU kernel.

Extends the cached dense-adjacency path (``ops/spmm.py``, 83-87% of HBM
roofline on v5e but O(N^2) memory) to graphs where ``[N, N]`` does not
fit: only the nonempty ``BS x BS`` adjacency blocks are materialised and
streamed through the MXU. Reference boundary: this serves the same calls
as ``torch.ops.torch_sparse.spmm_sum`` (reference ``edge_index.py:1798``)
for cached, weight-baked adjacencies (``GCNConv(cached=True)``,
reference ``gcn_conv.py:116``).

Design (scalar-prefetch block-sparse matmul):
  * Host pass groups edges into ``BS x BS`` dst/src blocks; nonempty
    blocks are stored dense ``[NB, BS, BS]`` sorted by (dst_blk,
    src_blk); empty dst rows get one explicit zero block so every output
    block is visited.
  * Grid = (f_tiles, NB) — the block dim iterates innermost, so all
    blocks of one dst row accumulate into the SAME output block while it
    stays resident in VMEM; ``first`` flags zero-initialise on each
    row's first block (the canonical TPU block-sparse accumulation
    pattern).
  * ``PrefetchScalarGridSpec`` feeds the per-block dst/src block ids to
    the index maps, so ``x`` tiles are DMA'd by *data-dependent* block
    id — the gather that caps the COO path at ~7% of roofline becomes a
    streaming block load.

Traffic per block ~ (1 + x-reuse) * BS*BS*4 bytes; profitable when mean
edges-per-nonempty-block clears ``PGT_BSR_MIN_EPB`` (default 16; real
clustered graphs after the multilevel partitioner sit far above it).

Backward: ``grad_x = A^T @ g`` via the transposed block layout
(host-built alongside the forward one) — the BSR analog of the
reference's cached-transpose SpMM backward (``edge_index.py:1849``).
Baked block values are constants (same contract as ``dense_adj``).
"""

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

BS = 128    # block edge (nodes per block, both dims)
BF = 128    # feature tile


class BSR(NamedTuple):
    """Nonempty-block adjacency, sorted by (dst_block, src_block).

    vals:  [NB, BS, BS] dense block values (vals[k, d_local, s_local])
    rows:  [NB] dst block index per block
    cols:  [NB] src block index per block
    first: [NB] 1 where a dst row's first block starts (zero-init flag)
    """
    vals: jnp.ndarray
    rows: jnp.ndarray
    cols: jnp.ndarray
    first: jnp.ndarray


def build_bsr(coo: np.ndarray, weight: np.ndarray, num_src: int,
              num_dst: int, dtype=np.float32) -> BSR:
    """Host: bucket edges into BS x BS blocks; dense-fill the nonempty
    ones. Padded edges (endpoint >= size) are dropped."""
    src = coo[0].astype(np.int64)
    dst = coo[1].astype(np.int64)
    valid = (src < num_src) & (dst < num_dst)
    src, dst = src[valid], dst[valid]
    w = np.asarray(weight, np.float64)[valid]

    d_blocks = max((num_dst + BS - 1) // BS, 1)
    s_blocks = max((num_src + BS - 1) // BS, 1)
    key = (dst // BS) * s_blocks + (src // BS)
    uniq, inv = np.unique(key, return_inverse=True)

    # every dst row needs >= 1 block (the kernel zero-inits on `first`,
    # so unvisited output blocks would hold garbage): splice a zero
    # block (col 0) into each empty row, keeping (row, col) order.
    empty_rows = np.setdiff1d(np.arange(d_blocks), uniq // s_blocks)
    all_keys = np.sort(np.concatenate([uniq, empty_rows * s_blocks]))
    # vectorized slot lookup (a python dict loop here cost ~30s at
    # products scale); all_keys is sorted and contains every uniq key
    blk_slot = np.searchsorted(all_keys, uniq)[inv]

    nb = len(all_keys)
    # bincount beats np.add.at ~10x on tens of millions of edges
    flat = blk_slot * (BS * BS) + (dst % BS) * BS + (src % BS)
    vals = np.bincount(flat, weights=w,
                       minlength=nb * BS * BS).reshape(nb, BS, BS)
    rows = (all_keys // s_blocks).astype(np.int32)
    cols = (all_keys % s_blocks).astype(np.int32)
    first = np.concatenate([[1], (rows[1:] != rows[:-1]).astype(np.int32)])
    return BSR(vals=jnp.asarray(vals.astype(dtype)),
               rows=jnp.asarray(rows), cols=jnp.asarray(cols),
               first=jnp.asarray(first.astype(np.int32)))


def bsr_stats(coo: np.ndarray, num_src: int, num_dst: int):
    """(num_nonempty_blocks, mean edges per nonempty block) — the
    profitability signal checked before building."""
    src = coo[0].astype(np.int64)
    dst = coo[1].astype(np.int64)
    valid = (src < num_src) & (dst < num_dst)
    e = int(valid.sum())
    if e == 0:
        return 0, 0.0
    s_blocks = max((num_src + BS - 1) // BS, 1)
    key = (dst[valid] // BS) * s_blocks + (src[valid] // BS)
    nb = len(np.unique(key))
    return nb, e / nb


def _make_kernel(precision, bf16: bool = False):
    from jax.experimental import pallas as pl

    # Inputs are cast to f32 below, so HIGH (bf16x3) is meaningless here
    # and Mosaic rejects it — use exact f32 instead.
    if precision == jax.lax.Precision.HIGH:
        precision = jax.lax.Precision.HIGHEST

    def kernel(rows_ref, cols_ref, first_ref, vals_ref, x_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(first_ref[i] == 1)
        def _zero():
            out_ref[...] = jnp.zeros_like(out_ref)

        if bf16:
            # bf16-stored blocks (fill_cache cache_dtype=bf16): single
            # MXU pass with f32 accumulation — halves the dominant
            # block stream AND skips the 6-pass exact-f32 contraction.
            # Explicit DEFAULT precision: the package-global
            # jax_default_matmul_precision='highest' would stamp
            # contract_precision<fp32> on a bf16 dot, which Mosaic
            # rejects ("Bad lhs type").
            out_ref[...] += jax.lax.dot(
                vals_ref[0], x_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        else:
            out_ref[...] += jax.lax.dot(
                vals_ref[0].astype(jnp.float32),
                x_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=precision)

    return kernel


def _bsr_matmul_impl(bsr: BSR, x: jnp.ndarray, num_out: int,
                     interpret: bool, vma=None) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .spmm import _dense_precision

    nb = bsr.vals.shape[0]
    n_src, f = x.shape
    s_pad = ((n_src + BS - 1) // BS) * BS
    f_pad = ((max(f, 1) + BF - 1) // BF) * BF
    d_blocks = max((num_out + BS - 1) // BS, 1)
    bf16 = bsr.vals.dtype == jnp.bfloat16
    x_p = jnp.pad(x.astype(jnp.bfloat16) if bf16 else x,
                  ((0, s_pad - n_src), (0, f_pad - f)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(f_pad // BF, nb),
        in_specs=[
            pl.BlockSpec((1, BS, BS),
                         lambda j, i, rows, cols, first: (i, 0, 0)),
            pl.BlockSpec((BS, BF),
                         lambda j, i, rows, cols, first: (cols[i], j)),
        ],
        out_specs=pl.BlockSpec(
            (BS, BF), lambda j, i, rows, cols, first: (rows[i], j)),
    )
    # vma: inside shard_map the output varies over the mesh axis the
    # inputs vary over; jax requires it to be stated explicitly.
    out_shape = (jax.ShapeDtypeStruct((d_blocks * BS, f_pad),
                                      jnp.float32) if vma is None else
                 jax.ShapeDtypeStruct((d_blocks * BS, f_pad),
                                      jnp.float32, vma=frozenset(vma)))
    out = pl.pallas_call(
        _make_kernel(_dense_precision(), bf16=bf16),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bsr.rows, bsr.cols, bsr.first, bsr.vals, x_p)
    return out[:num_out, :f].astype(x.dtype)


def _interpret() -> bool:
    try:
        return jax.default_backend() not in ('tpu', 'axon')
    except Exception:
        return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bsr_spmm(bsr: BSR, bsr_t: BSR, x: jnp.ndarray, num_dst: int,
             num_src: int, vma=None) -> jnp.ndarray:
    """out = A @ x over the block layout; differentiable in ``x``.
    ``vma``: varying mesh axes when called inside shard_map."""
    return _bsr_matmul_impl(bsr, x, num_dst, _interpret(), vma)


def _bsr_fwd(bsr, bsr_t, x, num_dst, num_src, vma):
    return bsr_spmm(bsr, bsr_t, x, num_dst, num_src, vma), (bsr, bsr_t)


def _bsr_bwd(num_dst, num_src, vma, res, g):
    bsr, bsr_t = res
    grad_x = _bsr_matmul_impl(bsr_t, g, num_src, _interpret(), vma)
    zeros = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), (bsr, bsr_t))
    return (*zeros, grad_x)


bsr_spmm.defvjp(_bsr_fwd, _bsr_bwd)


def block_fill_mask(coo: np.ndarray, num_src: int, num_dst: int,
                    min_fill: Optional[int] = None) -> np.ndarray:
    """Boolean mask of edges landing in blocks with >= ``min_fill``
    edges (the ones worth materialising as dense MXU blocks)."""
    if min_fill is None:
        min_fill = int(float(os.environ.get('PGT_BSR_MIN_FILL', 16)))
    src = coo[0].astype(np.int64)
    dst = coo[1].astype(np.int64)
    valid = (src < num_src) & (dst < num_dst)
    s_blocks = max((num_src + BS - 1) // BS, 1)
    key = np.where(valid, (dst // BS) * s_blocks + (src // BS), -1)
    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    dense_blk = (counts >= min_fill) & (uniq >= 0)
    return dense_blk[inv] & valid


def split_by_block_fill(coo: np.ndarray, weight: np.ndarray,
                        num_src: int, num_dst: int,
                        min_fill: Optional[int] = None):
    """Split edges into (dense-block part, residual part): blocks with
    >= ``min_fill`` edges pay for their 64 KB stream; the scattered tail
    stays on the gather path. Returns
    ``(coo_blk, w_blk, coo_res, w_res, captured_fraction)``."""
    src = coo[0].astype(np.int64)
    dst = coo[1].astype(np.int64)
    w = np.asarray(weight)
    valid = (src < num_src) & (dst < num_dst)
    in_blk = block_fill_mask(coo, num_src, num_dst, min_fill)
    res = valid & ~in_blk
    e_valid = max(int(valid.sum()), 1)
    frac = float(in_blk.sum()) / e_valid
    return (coo[:, in_blk], w[in_blk], coo[:, res], w[res], frac)


def build_bsr_pair(coo: np.ndarray, weight: np.ndarray, num_src: int,
                   num_dst: int, dtype=np.float32, hybrid: bool = True,
                   in_blk: Optional[np.ndarray] = None):
    """Forward (dst-major) + transpose (src-major) block layouts —
    the pair the custom VJP needs — plus the residual COO
    ``(src, dst, w)`` of edges left on the gather path (``None`` if
    every edge was captured or ``hybrid=False``). ``in_blk``: a
    precomputed block-fill mask (skips the re-analysis)."""
    res = None
    if hybrid:
        if in_blk is not None:
            w = np.asarray(weight)
            valid = (coo[0] < num_src) & (coo[1] < num_dst)
            res_m = valid & ~in_blk
            coo_blk, w_blk = coo[:, in_blk], w[in_blk]
            coo_res, w_res = coo[:, res_m], w[res_m]
        else:
            coo_blk, w_blk, coo_res, w_res, _ = split_by_block_fill(
                coo, weight, num_src, num_dst)
        if coo_res.shape[1] > 0:
            res = (jnp.asarray(coo_res[0].astype(np.int32)),
                   jnp.asarray(coo_res[1].astype(np.int32)),
                   jnp.asarray(np.asarray(w_res, np.float32)))
            coo, weight = coo_blk, w_blk
    fwd = build_bsr(coo, weight, num_src, num_dst, dtype)
    bwd = build_bsr(coo[::-1], weight, num_dst, num_src, dtype)
    # transpose layout aggregates onto sources: its block values must be
    # indexed [s_local, d_local]; build_bsr on the flipped COO already
    # does exactly that (its "dst" is our src).
    return fwd, bwd, res


def _sampled_capture(coo: np.ndarray, num_src: int, num_dst: int,
                     frac: float,
                     min_fill: Optional[int] = None) -> float:
    """Capture-fraction estimate from an edge sample: the share of
    sampled edges landing in blocks whose *estimated* full count clears
    ``min_fill`` (sampled count >= min_fill * frac, floored at 2 so the
    estimate is not trivially 1)."""
    if min_fill is None:
        min_fill = int(float(os.environ.get('PGT_BSR_MIN_FILL', 16)))
    src = coo[0].astype(np.int64)
    dst = coo[1].astype(np.int64)
    valid = (src < num_src) & (dst < num_dst)
    if not valid.any():
        return 0.0
    s_blocks = max((num_src + BS - 1) // BS, 1)
    key = (dst[valid] // BS) * s_blocks + (src[valid] // BS)
    _, counts = np.unique(key, return_counts=True)
    need = max(int(np.ceil(min_fill * frac)), 2)
    return float(counts[counts >= need].sum() / counts.sum())


def choose_block_order(coo: np.ndarray, num_src: int, num_dst: int):
    """(perm, inv, capture_frac, in_blk_mask) of a hubs-first relabel
    if it meaningfully improves 128x128 block fill, else
    (None, None, cap, mask).
    Square adjacency only — the same permutation must apply to rows and
    columns so the cached transpose stays P A^T P^T. The returned
    capture fraction (of whichever layout won) lets the caller skip
    re-running the block-fill analysis. Measured on scrambled power-law
    graphs: captured-edge fraction 0.22 -> 0.71, nonempty blocks cut
    2.6x (benchmarks/reorder_quality.py)."""
    if num_src != num_dst or os.environ.get('PGT_DISABLE_BSR_REORDER'):
        return None, None, None, None
    from ..utils.reorder import degree_order
    n = num_src

    # Giant-E prefilter: the full block-fill analysis is an O(E log E)
    # host sort run twice (natural + reordered); at ogbn-products scale
    # that is minutes spent to (typically) reject BSR. Estimate both
    # captures from a sample first and bail early when neither can
    # clear the profitability threshold.
    e = coo.shape[1]
    sample_above = int(float(os.environ.get('PGT_BSR_SAMPLE_ABOVE',
                                            32e6)))
    if e > sample_above:
        frac = min(1.0, 16e6 / e)
        rng = np.random.default_rng(0)
        samp = coo[:, rng.integers(0, e, int(e * frac))]
        est0 = _sampled_capture(samp, n, n, frac)
        perm_s = degree_order(coo, n)
        inv_s = np.empty(n, np.int64)
        inv_s[perm_s] = np.arange(n)
        inv_ext = np.concatenate([inv_s, [n]])
        est1 = _sampled_capture(inv_ext[np.minimum(
            samp.astype(np.int64), n)], n, n, frac)
        min_capture = float(os.environ.get('PGT_BSR_MIN_CAPTURE', 0.5))
        if max(est0, est1) < 0.8 * min_capture:
            return None, None, max(est0, est1), None

    def capture_of(c):
        m = block_fill_mask(c, n, n)
        valid = (c[0] < n) & (c[1] < n)
        return float(m.sum()) / max(int(valid.sum()), 1), m

    cap0, mask0 = capture_of(coo)
    if cap0 >= 0.85:            # natural order already block-dense
        return None, None, cap0, mask0
    perm = degree_order(coo, n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    # padded endpoints (== n sentinel) must survive the relabel
    inv_ext = np.concatenate([inv, [n]])
    coo_r = inv_ext[np.minimum(coo.astype(np.int64), n)]
    cap1, mask1 = capture_of(coo_r)
    if cap1 > cap0 * 1.25 and cap1 - cap0 > 0.05:
        return perm, inv, cap1, mask1
    return None, None, cap0, mask0


def bsr_profitable(coo: np.ndarray, num_src: int, num_dst: int,
                   max_entries: Optional[int] = None,
                   capture: Optional[float] = None,
                   in_blk: Optional[np.ndarray] = None) -> bool:
    """Gate for the hybrid split: enough of the edge mass lands in
    dense-enough blocks (``PGT_BSR_MIN_CAPTURE``, default 0.5) and the
    captured blocks' storage fits the memory cap. ``capture``/``in_blk``
    (from choose_block_order) skip the O(E log E) re-analysis."""
    if os.environ.get('PGT_DISABLE_BSR_SPMM'):
        return False
    min_capture = float(os.environ.get('PGT_BSR_MIN_CAPTURE', 0.5))
    cap = max_entries if max_entries is not None else int(
        float(os.environ.get('PGT_BSR_MAX_ENTRIES', 5e8)))
    if capture is not None and capture < min_capture:
        return False
    if capture is not None and in_blk is not None:
        coo_blk = coo[:, in_blk]
        if coo_blk.shape[1] == 0:
            return False
        nb, _ = bsr_stats(coo_blk, num_src, num_dst)
        return nb * BS * BS <= cap
    coo_blk, _, _, _, frac = split_by_block_fill(
        coo, np.ones(coo.shape[1], np.float32), num_src, num_dst)
    if coo_blk.shape[1] == 0 or frac < min_capture:
        return False
    nb, _ = bsr_stats(coo_blk, num_src, num_dst)
    return nb * BS * BS <= cap
