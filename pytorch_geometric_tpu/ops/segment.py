"""CSR/ptr-based segment reductions.

TPU-native equivalent of the reference's ``segment()``
(``torch_geometric/utils/_segment.py:11-80``, which dispatches to
``torch_scatter.segment_csr``). On TPU a ptr-based reduction over sorted
edges is the deterministic, bandwidth-friendly path; we materialise the
per-element segment id from ``ptr`` (a searchsorted, fused by XLA) and
reuse the segment primitives with ``indices_are_sorted=True``.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .scatter import scatter


def ptr2index(ptr: jnp.ndarray, num_elements: Optional[int] = None) -> jnp.ndarray:
    """Expand a CSR row-pointer into per-element segment ids.

    Reference: ``torch_geometric/index.py:27-31`` (``ptr2index``).
    """
    if num_elements is None:
        num_elements = int(ptr[-1])
    pos = jnp.arange(num_elements, dtype=ptr.dtype)
    # segment id of element e = number of ptr entries (excluding ptr[0]) <= e
    return jnp.searchsorted(ptr[1:], pos, side='right').astype(ptr.dtype)


def index2ptr(index: jnp.ndarray, size: int) -> jnp.ndarray:
    """Build a CSR pointer from a **sorted** segment-id vector.

    Reference: ``torch_geometric/index.py:33-37`` (``index2ptr``).
    """
    pos = jnp.arange(size + 1, dtype=index.dtype)
    return jnp.searchsorted(index, pos, side='left').astype(index.dtype)


@partial(jax.jit, static_argnames=('num_segments', 'reduce'))
def segment(src: jnp.ndarray, ptr: jnp.ndarray, num_segments: int,
            reduce: str = 'sum') -> jnp.ndarray:
    """Segment-reduce contiguous runs of ``src`` delimited by ``ptr``.

    ``ptr`` has shape ``[num_segments + 1]``; ``src`` is sorted by segment.
    """
    index = ptr2index(ptr, src.shape[0])
    return scatter(src, index, num_segments, reduce=reduce,
                   indices_are_sorted=True)


@partial(jax.jit, static_argnames=('num_segments',))
def segment_logsumexp(src: jnp.ndarray, ptr: jnp.ndarray,
                      num_segments: int) -> jnp.ndarray:
    """Numerically-stable per-segment logsumexp
    (reference ``utils/_segment.py:53``)."""
    index = ptr2index(ptr, src.shape[0])
    maxes = jax.ops.segment_max(src, index, num_segments,
                                indices_are_sorted=True)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0)
    shifted = jnp.exp(src - maxes[index])
    sums = jax.ops.segment_sum(shifted, index, num_segments,
                               indices_are_sorted=True)
    return maxes + jnp.log(jnp.maximum(sums, 1e-38))
