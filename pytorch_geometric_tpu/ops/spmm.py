"""Sparse (adjacency) x dense (features) matmul.

TPU-native equivalent of the reference SpMM dispatch ladder
(``torch_geometric/edge_index.py:1775-1970`` and
``torch_geometric/utils/_spmm.py:12``). Paths, best first:

  1. Pallas one-hot MXU kernel over row-sorted edges (``ops/pallas/spmm.py``)
     for reduce='sum' with dense-enough graphs.
  2. XLA gather -> multiply -> segment reduce (sorted when a cached
     orientation exists). XLA fuses this into a single pass; its autodiff
     (segment_sum bwd = gather, gather bwd = scatter-add) reproduces the
     reference's cached-transpose backward (``edge_index.py:1849``)
     without hand-written VJP.

``out[dst] = reduce over incoming edges of edge_weight * x[src]``
(aggregation runs over the *destination*, matching ``propagate`` flow
``MessagePassing`` semantics with flow='source_to_target').
"""

import functools
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..edge_index import EdgeIndex
from .scatter import scatter

_PALLAS_MIN_EDGES = 1 << 14

# Dense-adjacency dispatch. Measured on v5e (benchmarks/profile_step.py,
# 10k nodes / 210k edges / F=64): the dense [N, N] @ [N, F] matmul runs
# at ~78% of HBM roofline (0.63 ms) while the gather+Pallas sparse path
# reaches ~7% (2.39 ms) — random row-gathers are the TPU's weak spot.
# Dense traffic is ns*nd*4 bytes vs the sparse path's ~3*E*F*4 at ~1/11
# the effective bandwidth, so dense wins while ns*nd <= ~36*E*F, capped
# by an absolute entry budget (1 GB f32 by default).
_DENSE_MAX_ENTRIES = int(float(os.environ.get('PGT_DENSE_SPMM_ENTRIES',
                                              2.5e8)))
_DENSE_ADVANTAGE = 36.0


def auto_dense_cap(dtype_bytes: int = 4) -> int:
    """Entry budget for a cached dense adjacency.

    ``PGT_DENSE_SPMM_ENTRIES`` wins when set; otherwise sized off the
    device's reported HBM (1/8 of ``bytes_limit`` — the cache is
    streamed every SpMM pass, and fwd+bwd plus activations need the
    rest), falling back to the historical 2.5e8-entry default when the
    backend reports nothing (CPU)."""
    env = os.environ.get('PGT_DENSE_SPMM_ENTRIES')
    if env:
        return int(float(env))
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get('bytes_limit'):
            return int(stats['bytes_limit'] / (8 * max(dtype_bytes, 1)))
    except Exception:
        pass
    return int(2.5e8)


def spmm_regime(adj: EdgeIndex, num_feats: int = 64,
                reduce: str = 'sum',
                has_edge_weight: bool = False) -> str:
    """Report which algorithm :func:`spmm` will execute for this
    adjacency — the introspection half of the automatic dispatch policy
    (``EdgeIndex.fill_cache(auto=True)`` picks what to *cache*; the
    ladder here picks what to *run*). Mirrors the reference's private
    dispatch at ``edge_index.py:1925``.

    Returns one of ``'dense-cached' | 'bsr' | 'dense' | 'windowed' |
    'chunked' | 'pallas' | 'gather-sorted' | 'gather'``."""
    if not isinstance(adj, EdgeIndex):
        adj = EdgeIndex(adj)
    simple = reduce in ('sum', 'mean')
    if (getattr(adj, 'dense_adj', None) is not None and simple
            and not has_edge_weight
            and not os.environ.get('PGT_DISABLE_DENSE_SPMM')):
        return 'dense-cached'
    if (getattr(adj, 'bsr', None) is not None
            and getattr(adj, 'bsr_t', None) is not None and simple
            and not has_edge_weight
            and not os.environ.get('PGT_DISABLE_BSR_SPMM')):
        return 'bsr'
    x_probe = jax.ShapeDtypeStruct((adj.num_src_nodes, num_feats),
                                   jnp.float32)
    if simple and _dense_profitable(adj, x_probe):
        return 'dense'
    if (getattr(adj, 'win', None) is not None
            and getattr(adj, 'win_t', None) is not None and simple
            and not os.environ.get('PGT_DISABLE_WIN_SPMM')):
        return 'windowed'
    if (simple
            and adj.num_edges * num_feats * 4 > _CHUNK_TRIGGER_BYTES):
        return 'chunked'
    from .. import backend
    use_pallas = backend.use_pallas_spmm
    if use_pallas is None:
        from .pallas_spmm import _use_pallas
        use_pallas = (_use_pallas()
                      and getattr(adj, 'blocked', None) is not None)
    if (use_pallas and simple and adj.num_edges >= _PALLAS_MIN_EDGES):
        return 'pallas'
    return 'gather-sorted' if adj.csc is not None else 'gather'


def _dense_profitable(adj: EdgeIndex, x) -> bool:
    if os.environ.get('PGT_DISABLE_DENSE_SPMM'):
        return False
    # The densification trade only pays on the MXU: on CPU a dense
    # [N, N] @ [N, F] is O(N^2 F) real FLOPs vs the sparse path's
    # O(E F), with no 11x bandwidth edge to buy it back (measured: the
    # 10k-node bench regressed 18.5s -> 150s when this fired on CPU).
    # PGT_FORCE_DENSE_SPMM bypasses the backend gate (CPU-only tests).
    if (jax.default_backend() == 'cpu'
            and not os.environ.get('PGT_FORCE_DENSE_SPMM')):
        return False
    ns, nd = adj.num_src_nodes, adj.num_dst_nodes
    f = x.shape[-1]
    return (ns * nd <= _DENSE_MAX_ENTRIES
            and ns * nd <= _DENSE_ADVANTAGE * adj.num_edges * max(f, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dense_spmm(coo, w, x, n_src, n_dst):
    """out = A @ x with A[d, s] = sum of w over edges (s -> d).

    Padded edges (endpoint >= size) contribute zero. Backward reuses the
    materialised A for grad_x = A^T @ g — the dense analog of the
    reference's cached-transpose SpMM backward
    (``edge_index.py:1849-1897``)."""
    out, _ = _dense_spmm_fwd(coo, w, x, n_src, n_dst)
    return out


def _dense_build(coo, w, n_src, n_dst, dtype):
    src = jnp.minimum(coo[0], n_src)
    dst = jnp.minimum(coo[1], n_dst)
    valid = (coo[0] < n_src) & (coo[1] < n_dst)
    wz = jnp.where(valid, w.astype(dtype), 0)
    A = jnp.zeros((n_dst + 1, n_src + 1), dtype)
    A = A.at[dst, src].add(wz)
    return A[:n_dst, :n_src]


def _dense_precision():
    """HIGH (bf16x3, ~2^-21 relative error) by default — A/B'd on v5e
    (bench.py, same window): HIGHEST 1.787s / 83.1% of HBM roofline,
    HIGH 1.699s / 87.3%, DEFAULT (single bf16 pass, ~1e-2 relative)
    0.895s. DEFAULT's error is too loose for parity to the f32
    reference; HIGH is numerically indistinguishable at test
    tolerances. Override with PGT_DENSE_SPMM_PRECISION=
    default|high|highest."""
    p = os.environ.get('PGT_DENSE_SPMM_PRECISION', '').lower()
    if p == 'default':
        return jax.lax.Precision.DEFAULT
    if p == 'highest':
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.HIGH


def _dense_spmm_fwd(coo, w, x, n_src, n_dst):
    A = _dense_build(coo, w, n_src, n_dst, x.dtype)
    out = jnp.matmul(A, x, precision=_dense_precision())
    return out, (A, coo, w, x)


def _dense_spmm_bwd(n_src, n_dst, res, g):
    A, coo, w, x = res
    grad_x = jnp.matmul(A.T, g, precision=_dense_precision())
    src = jnp.minimum(coo[0], n_src - 1)
    dst = jnp.minimum(coo[1], n_dst - 1)
    valid = (coo[0] < n_src) & (coo[1] < n_dst)
    grad_w = jnp.where(valid, (x[src] * g[dst]).sum(-1), 0)
    return (np.zeros(coo.shape, jax.dtypes.float0),
            grad_w.astype(w.dtype), grad_x)


_dense_spmm.defvjp(_dense_spmm_fwd, _dense_spmm_bwd)


# Edge-chunked path for giant graphs: every other path materialises the
# gathered [E, F] messages in HBM (40 GB at ogbn-products scale, a
# guaranteed OOM on a 16 GB chip). Above this many gathered bytes, run
# the edge list through a lax.scan in ~1 GB chunks with an [N, F]
# accumulator; the custom VJP mirrors the two passes (grad_x is the
# transposed chunked pass, grad_w a chunked per-edge dot).
_CHUNK_TRIGGER_BYTES = float(os.environ.get('PGT_SPMM_CHUNK_TRIGGER',
                                            4e9))
_CHUNK_BUF_BYTES = float(os.environ.get('PGT_SPMM_CHUNK_BUF', 1e9))


def _chunk_pass(src, dst, w, x, num_out, chunk):
    """sum_e w_e * x[src_e] into out[dst_e], edges processed in chunks.
    Invalid endpoints (>= sizes) drop out."""
    e = src.shape[0]
    n_chunks = max(-(-e // chunk), 1)
    pad = n_chunks * chunk - e
    srcp = jnp.pad(src, (0, pad), constant_values=x.shape[0])
    dstp = jnp.pad(dst, (0, pad), constant_values=num_out)
    wp = jnp.pad(w, (0, pad))
    xs = (srcp.reshape(n_chunks, chunk), dstp.reshape(n_chunks, chunk),
          wp.reshape(n_chunks, chunk))

    def body(acc, args):
        s, d, ww = args
        valid = (s < x.shape[0]) & (d < num_out)
        msg = x[jnp.minimum(s, x.shape[0] - 1)]
        msg = jnp.where(valid[:, None], msg * ww[:, None].astype(
            msg.dtype), 0)
        part = jax.ops.segment_sum(msg, jnp.where(valid, d, num_out),
                                   num_out + 1)
        return acc + part[:num_out], None

    acc0 = jnp.zeros((num_out, x.shape[1]), x.dtype)
    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _chunked_spmm(src, dst, w, x, num_out, chunk):
    return _chunk_pass(src, dst, w, x, num_out, chunk)


def _chunked_spmm_fwd(src, dst, w, x, num_out, chunk):
    return _chunk_pass(src, dst, w, x, num_out, chunk), (src, dst, w, x)


def _chunked_spmm_bwd(num_out, chunk, res, g):
    src, dst, w, x = res
    # grad_x = A^T g: the same chunked pass with edge roles swapped
    grad_x = _chunk_pass(dst, src, w, g, x.shape[0], chunk)
    # grad_w: per-edge <x[src], g[dst]>, chunked to avoid an [E, F]
    e = src.shape[0]
    n_chunks = max(-(-e // chunk), 1)
    pad = n_chunks * chunk - e
    srcp = jnp.pad(src, (0, pad), constant_values=x.shape[0])
    dstp = jnp.pad(dst, (0, pad), constant_values=num_out)

    def body(_, args):
        s, d = args
        valid = (s < x.shape[0]) & (d < num_out)
        dot = (x[jnp.minimum(s, x.shape[0] - 1)]
               * g[jnp.minimum(d, num_out - 1)]).sum(-1)
        return None, jnp.where(valid, dot, 0)

    _, gw = jax.lax.scan(body, None,
                         (srcp.reshape(n_chunks, chunk),
                          dstp.reshape(n_chunks, chunk)))
    grad_w = gw.reshape(-1)[:e].astype(w.dtype)
    return (np.zeros(src.shape, jax.dtypes.float0),
            np.zeros(dst.shape, jax.dtypes.float0),
            grad_w, grad_x)


_chunked_spmm.defvjp(_chunked_spmm_fwd, _chunked_spmm_bwd)


# Windowed giant-E path: like the naive chunked scan above but over the
# host-presorted WindowedCSC layout — each chunk scatter-adds directly
# into the carried accumulator with ``indices_are_sorted=True``, which
# XLA:TPU lowers ~1.7x faster than the unsorted scatter (A/B'd on v5e,
# products scale 0.2: 0.437 s vs 0.735 s same reduction). Backward runs
# the transpose layout (cached at fill_cache time).


def _win_pass(win, w_ext, x, num_out):
    """sum_e w_e * x[src_e] into out[dst_e] over a WindowedCSC layout.
    ``w_ext``: [E+1] per-edge weights with a trailing 0 for padded
    slots, or None."""
    f = x.shape[1]
    n_src = x.shape[0]
    acc0 = jnp.zeros((num_out, f), x.dtype)

    def body(acc, args):
        s, d, p = args
        valid = s < n_src
        msg = x[jnp.minimum(s, n_src - 1)]
        if w_ext is not None:
            msg = msg * w_ext[p][:, None].astype(msg.dtype)
        msg = jnp.where(valid[:, None], msg, 0)
        # d == num_out marks pads / out-of-range edges -> dropped
        return acc.at[d].add(msg, mode='drop',
                             indices_are_sorted=True), None

    acc, _ = jax.lax.scan(body, acc0, (win.src, win.dst, win.perm))
    return acc


def _win_zeros(win):
    return jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), win)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _windowed_spmm(win, win_t, w, x, n_src, n_dst):
    """out = A @ x over the windowed layouts; ``w`` is per-edge [E]
    weights or None."""
    out, _ = _windowed_spmm_fwd(win, win_t, w, x, n_src, n_dst)
    return out


def _ext(w):
    return (None if w is None
            else jnp.concatenate([w, jnp.zeros((1,), w.dtype)]))


def _windowed_spmm_fwd(win, win_t, w, x, n_src, n_dst):
    return (_win_pass(win, _ext(w), x, n_dst), (win, win_t, w, x))


def _windowed_spmm_bwd(n_src, n_dst, res, g):
    win, win_t, w, x = res
    # grad_x = A^T g: the same pass over the transpose windows
    grad_x = _win_pass(win_t, _ext(w), g, n_src)
    if w is None:
        grad_w = None
    else:
        # per-slot <x[src], g[dst]> then one gather back to edge order
        def body(_, args):
            s, d, p = args
            valid = (s < n_src) & (d < n_dst)
            xe = x[jnp.minimum(s, n_src - 1)]
            ge = g[jnp.minimum(d, n_dst - 1)]
            return None, jnp.where(valid, (xe * ge).sum(-1), 0)

        _, dots = jax.lax.scan(body, None, (win.src, win.dst, win.perm))
        # inv_pos maps every original edge to its (real) sorted slot
        grad_w = dots.reshape(-1)[win.inv_pos].astype(w.dtype)
    return (_win_zeros(win), _win_zeros(win_t), grad_w, grad_x)


_windowed_spmm.defvjp(_windowed_spmm_fwd, _windowed_spmm_bwd)


def spmm(adj: Union[EdgeIndex, jnp.ndarray], x: jnp.ndarray,
         edge_weight: Optional[jnp.ndarray] = None, reduce: str = 'sum',
         transpose: bool = False, use_pallas: Optional[bool] = None
         ) -> jnp.ndarray:
    """Aggregate ``x`` over graph edges: ``out[c] = reduce_e w_e * x[r_e]``.

    Args:
        adj: ``EdgeIndex`` or raw ``[2, E]`` int array.
        x: ``[N_src, F]`` node features.
        edge_weight: optional ``[E]`` weights (sum/mean only).
        reduce: sum | mean | min | max.
        transpose: aggregate onto sources instead of destinations
            (A^T x — used by backward passes and flow='target_to_source').
    """
    if not isinstance(adj, EdgeIndex):
        adj = EdgeIndex(adj)
    if transpose:
        adj = adj.flip()

    if edge_weight is None and getattr(adj, 'weight', None) is not None:
        # weights carried from a fill_cache that declined to bake a
        # dense/BSR cache (CPU auto mode, giant graphs) — the sparse
        # regimes apply them here so cache_gcn_norm-style baked norms
        # stay correct in every regime
        edge_weight = adj.weight

    num_out = adj.num_dst_nodes
    src, dst = adj.row, adj.col

    # Cached dense adjacency (weights baked at fill_cache time — the
    # TPU analog of GCNConv(cached=True)): pure MXU matmul, autodiff
    # gives the A^T @ g backward for free.
    dense = getattr(adj, 'dense_adj', None)
    if (dense is not None and edge_weight is None
            and reduce in ('sum', 'mean') and x.ndim == 2
            and not os.environ.get('PGT_DISABLE_DENSE_SPMM')):
        if dense.dtype == jnp.int8:
            # quantized inference path (fill_cache(cache_dtype=int8)):
            # A ~= diag(r) Q diag(c), so A x = r * (Q @ (c * x)) with
            # (c * x) dynamically per-tensor int8-quantized; the
            # int8 x int8 -> int32 matmul runs the MXU at 2x bf16 with
            # half the HBM bytes. No gradients (round() kills them).
            r, c = adj.dense_scale
            xs = x.astype(jnp.float32) * c[:, None]
            x_scale = jnp.maximum(jnp.max(jnp.abs(xs)), 1e-30) / 127.0
            xq = jnp.clip(jnp.round(xs / x_scale), -127,
                          127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                dense, xq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * (x_scale * r[:, None])
            # enforce the inference-only contract: without this, grads
            # would flow ONLY through the dynamic x_scale (round() kills
            # the rest) — a garbage direction worse than zero
            out = jax.lax.stop_gradient(out)
        elif dense.dtype == jnp.bfloat16:
            # half-width cached adjacency (fill_cache cache_dtype=bf16):
            # the [N,N] stream is the bandwidth bottleneck; bf16 halves
            # it, f32 accumulation keeps the ~1e-2 rel error of a single
            # bf16 pass (bench.py 'default' arm numerics).
            out = jnp.matmul(dense, x.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.matmul(dense, x.astype(dense.dtype),
                             precision=_dense_precision())
        if reduce == 'mean':
            # cached dst-degree (csc indptr diff) when available: the
            # in-graph segment_sum costs ~0.3ms/call on v5e and XLA
            # does not reliably hoist it out of training scans
            # (measured 2x on the SAGE protocol bench)
            csc = adj.csc
            if csc is not None:
                deg = jnp.diff(csc.indptr).astype(x.dtype)[:num_out]
            else:
                ones = jnp.where(dst < num_out, 1.0, 0.0).astype(x.dtype)
                deg = jax.ops.segment_sum(
                    ones, jnp.minimum(dst, num_out - 1), num_out)
            out = out / jnp.maximum(deg, 1)[:, None]
        return out.astype(x.dtype)

    # Cached block-sparse adjacency (dense too big to materialise):
    # nonempty 128x128 blocks streamed through the MXU with
    # scalar-prefetch index maps (ops/bsr_spmm.py).
    bsr = getattr(adj, 'bsr', None)
    bsr_t = getattr(adj, 'bsr_t', None)
    if (bsr is not None and bsr_t is not None and edge_weight is None
            and reduce in ('sum', 'mean') and x.ndim == 2
            and not os.environ.get('PGT_DISABLE_BSR_SPMM')):
        from .bsr_spmm import bsr_spmm
        perm = getattr(adj, 'bsr_perm', None)
        xb = x if perm is None else x[perm]
        out = bsr_spmm(bsr, bsr_t, xb, num_out, adj.num_src_nodes)
        if perm is not None:
            # blocks were built on the relabeled graph (P A P^T):
            # out_old[o] = out_new[inv[o]]
            out = out[getattr(adj, 'bsr_inv')]
        res = getattr(adj, 'bsr_res', None)
        if res is not None:
            # scattered tail the hybrid split left on the gather path;
            # XLA autodiff supplies its backward
            r_src, r_dst, r_w = res
            out = out + jax.ops.segment_sum(
                x[r_src] * r_w[:, None].astype(x.dtype), r_dst, num_out)
        if reduce == 'mean':
            ones = jnp.where(dst < num_out, 1.0, 0.0).astype(x.dtype)
            deg = jax.ops.segment_sum(
                ones, jnp.minimum(dst, num_out - 1), num_out)
            out = out / jnp.maximum(deg, 1)[:, None]
        return out

    if (reduce in ('sum', 'mean') and x.ndim == 2
            and _dense_profitable(adj, x)):
        w = (edge_weight if edge_weight is not None
             else jnp.ones((adj.num_edges,), x.dtype))
        out = _dense_spmm(adj.coo, w, x, adj.num_src_nodes, num_out)
        if reduce == 'mean':
            ones = jnp.where(dst < num_out, 1.0, 0.0).astype(x.dtype)
            deg = jax.ops.segment_sum(
                ones, jnp.minimum(dst, num_out - 1), num_out)
            out = out / jnp.maximum(deg, 1)[:, None]
        return out

    # Windowed giant-E path (preferred over the naive chunked scan
    # whenever fill_cache prebuilt the layout): per-window [W, F]
    # updates instead of full [N, F] partials per chunk.
    win, win_t = getattr(adj, 'win', None), getattr(adj, 'win_t', None)
    if (win is not None and win_t is not None
            and reduce in ('sum', 'mean') and x.ndim == 2
            and not os.environ.get('PGT_DISABLE_WIN_SPMM')):
        out = _windowed_spmm(win, win_t, edge_weight, x,
                             adj.num_src_nodes, num_out)
        if reduce == 'mean':
            csc = adj.csc
            if csc is not None:
                # cached dst-degree: a [E] 1-D segment-sum is exactly
                # the narrow-scatter shape XLA:TPU serializes on
                deg = jnp.diff(csc.indptr).astype(x.dtype)[:num_out]
            else:
                ones = jnp.where(dst < num_out, 1.0, 0.0).astype(x.dtype)
                deg = jax.ops.segment_sum(
                    ones, jnp.minimum(dst, num_out - 1), num_out)
            out = out / jnp.maximum(deg, 1)[:, None]
        return out

    # Giant-E chunked path: every other sparse path materialises the
    # gathered [E, F] messages; at ogbn-products scale that alone
    # exceeds chip HBM.
    if (reduce in ('sum', 'mean') and x.ndim == 2
            and adj.num_edges * x.shape[1] * 4 > _CHUNK_TRIGGER_BYTES):
        w = (edge_weight if edge_weight is not None
             else jnp.ones((adj.num_edges,), x.dtype))
        chunk = max(1 << 16,
                    int(_CHUNK_BUF_BYTES / max(x.shape[1] * 4, 1)))
        out = _chunked_spmm(src, dst, w, x, num_out, chunk)
        if reduce == 'mean':
            ones = jnp.where(dst < num_out, 1.0, 0.0).astype(x.dtype)
            deg = jax.ops.segment_sum(
                ones, jnp.minimum(dst, num_out - 1), num_out)
            out = out / jnp.maximum(deg, 1)[:, None]
        return out

    if use_pallas is None:
        from .. import backend
        if backend.use_pallas_spmm is not None:
            use_pallas = backend.use_pallas_spmm
        else:
            # heuristic: the blocked MXU kernel A/B'd 2.65x faster than
            # the XLA path on the 3-layer-GCN train step (v5e) and
            # 2.8x/1.55x on the spmm microbench (F=128/512) — use it on
            # TPU whenever the host-blocked layout was prebuilt;
            # without the layout the windowed variant pays a full
            # overflow scatter, so fall back to XLA.
            from .pallas_spmm import _use_pallas
            use_pallas = (_use_pallas()
                          and getattr(adj, 'blocked', None) is not None)
        use_pallas = (use_pallas and reduce in ('sum', 'mean')
                      and adj.num_edges >= _PALLAS_MIN_EDGES
                      and x.ndim == 2)
    if use_pallas and reduce in ('sum', 'mean'):
        from .pallas_spmm import spmm_pallas
        out = spmm_pallas(adj, x, edge_weight)
        if reduce == 'mean':
            csc = adj.csc
            if csc is not None:
                deg = jnp.diff(csc.indptr).astype(out.dtype)
            else:
                ones = jnp.ones((adj.coo.shape[1],), out.dtype)
                deg = jax.ops.segment_sum(
                    ones, jnp.minimum(adj.col, num_out), num_out + 1
                )[:num_out]
            out = out / jnp.maximum(deg, 1)[:, None]
        return out

    csc = adj.csc  # cached dst-sorted orientation, if present
    if csc is not None:
        x_j = x[csc.indices]
        if edge_weight is not None:
            w = edge_weight[csc.perm]
            x_j = x_j * w[:, None] if x_j.ndim > 1 else x_j * w
        from .segment import ptr2index
        index = ptr2index(csc.indptr, x_j.shape[0])
        return scatter(x_j, index, num_out, reduce=reduce,
                       indices_are_sorted=True)

    x_j = x[src]
    if edge_weight is not None:
        x_j = x_j * edge_weight[:, None] if x_j.ndim > 1 else x_j * edge_weight
    return scatter(x_j, dst, num_out, reduce=reduce)
