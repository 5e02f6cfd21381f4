"""Index-based segment reductions (the GNN aggregation substrate).

TPU-native redesign of the reference's scatter dispatch
(``torch_geometric/utils/_scatter.py:14-292``): instead of dispatching
between ``scatter_add_`` / ``torch_scatter`` CUDA kernels, everything lowers
through ``jax.ops.segment_*`` so XLA can fuse the gather -> message ->
reduce chain. All entry points take a **static** ``dim_size`` (the
reference's ``dim_size`` / ``disable_dynamic_shapes`` discipline maps 1:1
onto XLA's static-shape requirement).

Padded edges are supported in two ways:
  * point the index at a row >= dim_size (XLA segment ops drop
    out-of-range indices), or
  * pass ``mask`` and the op substitutes the reduction identity.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

REDUCTIONS = ('sum', 'add', 'mean', 'min', 'max', 'mul', 'any')


def _broadcast(src: jnp.ndarray, other: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Expand `src` so it broadcasts against `other` along every dim but `dim`."""
    if dim < 0:
        dim = other.ndim + dim
    if src.ndim == 1:
        shape = [1] * other.ndim
        shape[dim] = -1
        src = src.reshape(shape)
    return jnp.broadcast_to(src, other.shape)


def _identity(reduce: str, dtype) -> jnp.ndarray:
    if reduce in ('sum', 'add', 'mean', 'any'):
        return jnp.zeros((), dtype)
    if reduce == 'mul':
        return jnp.ones((), dtype)
    if reduce == 'min':
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.array(jnp.inf, dtype)
        return jnp.array(jnp.iinfo(dtype).max, dtype)
    if reduce == 'max':
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.array(-jnp.inf, dtype)
        return jnp.array(jnp.iinfo(dtype).min, dtype)
    raise ValueError(f"Unknown reduction '{reduce}'")


LANE_PAD_BELOW = 16   # pad 2-D operands narrower than this to 128 lanes


def _pad_lanes(src: jnp.ndarray, reduce: str):
    """XLA:TPU's scatter lowering serializes on NARROW trailing dims —
    measured at E=7.4M / 388k segments on v5e: [E, 4] segment_max
    67,349 ms and segment_sum 696 ms vs **79 ms** for the same op
    padded to the 128-lane boundary ([E, 64]+ is already fine). Pad
    with the reduction's identity so the extra columns are inert, slice
    them off after. Returns (padded_src, original_width | None)."""
    if src.ndim != 2 or src.shape[1] >= LANE_PAD_BELOW:
        return src, None
    import os
    if not os.environ.get('PGT_FORCE_LANE_PAD'):    # test hook
        try:
            if jax.default_backend() not in ('tpu', 'axon'):
                # the pathology is XLA:TPU's scatter lowering; padding
                # on CPU/GPU only inflates traffic up to 128/width x
                return src, None
        except Exception:
            return src, None
    w = src.shape[1]
    # 'any' pads with zeros (false); _identity('max') would need iinfo
    # of a possibly-bool dtype
    fill = _identity('sum' if reduce == 'any' else reduce, src.dtype)
    pad = jnp.full((src.shape[0], 128 - w), fill, src.dtype)
    return jnp.concatenate([src, pad], axis=1), w


@partial(jax.jit, static_argnames=('dim_size', 'reduce', 'indices_are_sorted'))
def scatter(
    src: jnp.ndarray,
    index: jnp.ndarray,
    dim_size: int,
    reduce: str = 'sum',
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Segment-reduce ``src`` rows by ``index`` into ``dim_size`` segments.

    Equivalent of reference ``scatter()`` (``utils/_scatter.py:14``) with
    reduce in {sum, add, mean, min, max, mul, any}, restricted to dim=0
    (node dim); callers move their axis first. ``index`` is 1-D with
    ``index.shape[0] == src.shape[0]``.
    """
    if reduce not in REDUCTIONS:
        raise ValueError(f"Unknown reduction '{reduce}' (choose from "
                         f"{REDUCTIONS})")
    if mask is not None:
        # Out-of-range indices are dropped by XLA segment ops.
        index = jnp.where(mask, index, dim_size)

    src, _orig_w = _pad_lanes(src, reduce)
    if _orig_w is not None:
        out = scatter(src, index, dim_size, reduce,
                      indices_are_sorted=indices_are_sorted)
        return out[:, :_orig_w]

    if reduce in ('sum', 'add'):
        return jax.ops.segment_sum(src, index, dim_size,
                                   indices_are_sorted=indices_are_sorted)
    if reduce == 'mean':
        count = jax.ops.segment_sum(
            jnp.ones((src.shape[0],), src.dtype), index, dim_size,
            indices_are_sorted=indices_are_sorted)
        total = jax.ops.segment_sum(src, index, dim_size,
                                    indices_are_sorted=indices_are_sorted)
        count = jnp.maximum(count, 1)
        return total / _broadcast(count, total, 0)
    if reduce == 'min':
        out = jax.ops.segment_min(src, index, dim_size,
                                  indices_are_sorted=indices_are_sorted)
        # Empty segments come back as +inf/max; zero them like the reference.
        return jnp.where(out == _identity('min', src.dtype), 0, out)
    if reduce == 'max':
        out = jax.ops.segment_max(src, index, dim_size,
                                  indices_are_sorted=indices_are_sorted)
        return jnp.where(out == _identity('max', src.dtype), 0, out)
    if reduce == 'mul':
        return jax.ops.segment_prod(src, index, dim_size,
                                    indices_are_sorted=indices_are_sorted)
    if reduce == 'any':
        return jax.ops.segment_max(src.astype(jnp.int32), index, dim_size,
                                   indices_are_sorted=indices_are_sorted
                                   ).astype(src.dtype)
    raise AssertionError


@partial(jax.jit, static_argnames=('dim_size',))
def scatter_argmax(src: jnp.ndarray, index: jnp.ndarray,
                   dim_size: int) -> jnp.ndarray:
    """Per-segment argmax (reference ``utils/_scatter.py:147``).

    Returns, for every segment, the position in ``src`` attaining the
    segment max (or ``src.shape[0]`` for empty segments).
    """
    n = src.shape[0]
    maxes = jax.ops.segment_max(src, index, dim_size)
    is_max = src == maxes[index]
    pos = jnp.where(is_max, jnp.arange(n), n)
    return jax.ops.segment_min(pos, index, dim_size)


def group_argsort(src: jnp.ndarray, index: jnp.ndarray, dim_size: int,
                  descending: bool = False) -> jnp.ndarray:
    """Rank of each element within its segment (reference `group_argsort`,
    ``utils/_scatter.py:187``)."""
    if descending:
        src = -src
    # Sort by (index, src); rank within segment = position - segment start.
    order = jnp.lexsort((src, index))
    ranks_sorted = jnp.arange(src.shape[0])
    starts = jax.ops.segment_min(ranks_sorted, index[order], dim_size)
    within = ranks_sorted - starts[index[order]]
    out = jnp.zeros_like(within).at[order].set(within)
    return out
