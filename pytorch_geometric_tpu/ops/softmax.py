"""Edge (grouped) softmax.

TPU-native equivalent of reference ``softmax()``
(``torch_geometric/utils/_softmax.py:12-92``): max-subtracted grouped
softmax by destination index, with a small epsilon in the denominator.
The 3 passes (segment-max, exp-segment-sum, normalise) fuse under XLA;
a Pallas fused variant lives in ``ops/pallas/``.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .scatter import _broadcast


def softmax(src: jnp.ndarray, index: jnp.ndarray, num_segments: int,
            mask: Optional[jnp.ndarray] = None,
            edge_index=None) -> jnp.ndarray:
    """Softmax of ``src`` grouped by ``index`` (e.g. GAT attention over
    incoming edges). ``src`` may be ``[E]`` or ``[E, H]`` (per-head).

    Padded edges (``mask == False``) receive weight 0 and do not
    contribute to their segment's normalisation.

    When ``edge_index`` (an :class:`EdgeIndex` with a blocked cache whose
    destinations are ``index``) is supplied, the denominator runs through
    the fused blocked MXU kernel (:func:`ops.sddmm.edge_softmax`).
    """
    if edge_index is not None:
        from .sddmm import edge_softmax, fused_softmax_available
        if (fused_softmax_available(edge_index)
                and src.ndim == 2
                and src.shape[0] == edge_index.blocked.inv_pos.shape[0]):
            return edge_softmax(edge_index, src, edge_mask=mask)
    return _softmax_xla(src, index, num_segments, mask)


@partial(jax.jit, static_argnames=('num_segments', 'indices_are_sorted'))
def _softmax_xla(src: jnp.ndarray, index: jnp.ndarray, num_segments: int,
                 mask: Optional[jnp.ndarray] = None,
                 indices_are_sorted: bool = False) -> jnp.ndarray:
    # Narrow per-head logits ([E, H], H typically 1-8) hit XLA:TPU's
    # serialized scatter lowering — measured [E, 4] segment_max at
    # 67 s vs 79 ms padded to the 128-lane boundary (ops/scatter.py
    # _pad_lanes). Run the whole softmax lane-padded and slice.
    import os
    from .scatter import LANE_PAD_BELOW
    try:
        pad = (jax.default_backend() in ('tpu', 'axon')
               or bool(os.environ.get('PGT_FORCE_LANE_PAD')))
    except Exception:
        pad = False
    if pad and src.ndim == 2 and src.shape[1] < LANE_PAD_BELOW:
        w = src.shape[1]
        src_p = jnp.pad(src, ((0, 0), (0, 128 - w)))
        return _softmax_xla(src_p, index, num_segments, mask=mask,
                            indices_are_sorted=indices_are_sorted
                            )[:, :w]
    if mask is not None:
        # CAUTION (indices_are_sorted=True callers): masking rewrites
        # masked entries to the sentinel; that preserves sortedness
        # only when masked entries ALREADY sit at sentinel positions
        # (mask == index < num_segments) — true for the edge_attention
        # call sites, which fold invalidity into the index first
        index = jnp.where(mask, index, num_segments)
        num_segments_eff = num_segments + 1
    else:
        num_segments_eff = num_segments

    maxes = jax.ops.segment_max(src, index, num_segments_eff,
                                indices_are_sorted=indices_are_sorted)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0)
    gathered_max = maxes[jnp.minimum(index, num_segments_eff - 1)]
    out = jnp.exp(src - gathered_max)
    if mask is not None:
        out = jnp.where(_broadcast(mask, out, 0), out, 0)
    sums = jax.ops.segment_sum(out, index, num_segments_eff,
                               indices_are_sorted=indices_are_sorted)
    denom = sums[jnp.minimum(index, num_segments_eff - 1)] + 1e-16
    return out / denom
