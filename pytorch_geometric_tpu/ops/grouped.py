"""Typed (grouped) matrix multiply — the ``pyg_lib.ops.segment_matmul``
/ ``grouped_matmul`` role (reference ``nn/dense/linear.py:301`` uses it
inside HeteroLinear, ``rgcn_conv.py:224`` for typed message transforms).

Three TPU strategies, picked by type skew:

1. dense-einsum (default, small R): ``x @ W[r]`` for every (row, type)
   pair — one big MXU einsum, wastes R-1 of R FLOPs but no data
   movement. Wins while R is small because the MXU is FLOP-rich.
2. sort-and-batch (large R): rows sorted by type on the host into
   per-type runs padded to a shared bucket ``T``; compute is ONE
   batched GEMM ``[R, T, F] @ [R, F, C]`` — FLOPs proportional to
   rows + padding instead of rows * R.
3. ragged (large/skewed R, preferred): rows sorted by type, then
   ``jax.lax.ragged_dot`` — XLA's MoE grouped-GEMM primitive tiles
   variable-length type runs straight onto the MXU with **zero
   padding FLOPs**, the same role CUTLASS grouped GEMM plays for
   pyg-lib's ``segment_matmul``.

``TypedLayout`` / ``RaggedLayout`` are host-precomputed sorts
(analogous to the cached CSC permutations); build once per
graph/batch shape.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TypedLayout(NamedTuple):
    """Host-precomputed type-major layout.

    perm:    [R * T] row index feeding each slot (len(x) for pads)
    inv:     [N] slot of each row (for scattering results back)
    bucket:  T (rows per type after padding)
    """
    perm: jnp.ndarray
    inv: jnp.ndarray
    bucket: int


def build_typed_layout(types: np.ndarray, num_types: int,
                       bucket: Optional[int] = None) -> TypedLayout:
    """Sort rows by type; pad every type's run to ``bucket`` slots."""
    types = np.asarray(types)
    n = len(types)
    counts = np.bincount(types, minlength=num_types)
    T = int(bucket or (int(counts.max()) if n else 1))
    T = max(T, 1)
    if n and int(counts.max()) > T:
        raise ValueError(
            f"build_typed_layout: bucket={T} is smaller than the largest "
            f"per-type count ({int(counts.max())}); rows would be silently "
            f"dropped. Pass bucket=None to size automatically.")
    perm = np.full(num_types * T, n, np.int64)
    inv = np.zeros(n, np.int64)
    order = np.argsort(types, kind='stable')
    cursor = 0
    for r in range(num_types):
        c = int(counts[r])
        take = min(c, T)
        rows = order[cursor:cursor + take]
        perm[r * T:r * T + take] = rows
        inv[rows] = r * T + np.arange(take)
        cursor += c
    return TypedLayout(perm=jnp.asarray(perm.astype(np.int32)),
                       inv=jnp.asarray(inv.astype(np.int32)),
                       bucket=T)


class RaggedLayout(NamedTuple):
    """Host-precomputed type-major sort for ``lax.ragged_dot``.

    order:       [N] row indices sorted by type (stable)
    unorder:     [N] inverse permutation (sorted slot -> original row)
    group_sizes: [R] rows per type
    """
    order: jnp.ndarray
    unorder: jnp.ndarray
    group_sizes: jnp.ndarray


def build_ragged_layout(types: np.ndarray, num_types: int) -> RaggedLayout:
    """Stable type-sort of rows; no padding (see :class:`RaggedLayout`)."""
    types = np.asarray(types)
    order = np.argsort(types, kind='stable')
    unorder = np.empty_like(order)
    unorder[order] = np.arange(len(order))
    sizes = np.bincount(types, minlength=num_types)
    return RaggedLayout(order=jnp.asarray(order.astype(np.int32)),
                        unorder=jnp.asarray(unorder.astype(np.int32)),
                        group_sizes=jnp.asarray(sizes.astype(np.int32)))


def typed_matmul(x: jnp.ndarray, types: jnp.ndarray, weights: jnp.ndarray,
                 layout: Optional[NamedTuple] = None) -> jnp.ndarray:
    """out[i] = x[i] @ weights[types[i]].

    x: [N, F]; types: [N] int; weights: [R, F, C].
    With a :class:`RaggedLayout` (from :func:`build_ragged_layout`)
    uses ``lax.ragged_dot`` (zero padding FLOPs); with a
    :class:`TypedLayout` the sort-and-batch grouped GEMM; otherwise
    the dense einsum.
    """
    r = weights.shape[0]
    if isinstance(layout, RaggedLayout):
        out = jax.lax.ragged_dot(x[layout.order], weights,
                                 layout.group_sizes)
        return out[layout.unorder]
    if layout is None:
        # dense: [N, R, C] then select each row's type
        all_out = jnp.einsum('nf,rfc->nrc', x, weights)
        return jnp.take_along_axis(
            all_out, types[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
    n = x.shape[0]
    T = layout.bucket
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
    xs = x_pad[layout.perm].reshape(r, T, x.shape[1])
    out = jnp.einsum('rtf,rfc->rtc', xs, weights)   # batched MXU GEMM
    return out.reshape(r * T, -1)[layout.inv]


def grouped_matmul(xs, weights):
    """List-of-matrices variant (reference
    ``pyg_lib.ops.grouped_matmul``): out[i] = xs[i] @ weights[i]."""
    return [x @ w for x, w in zip(xs, weights)]
