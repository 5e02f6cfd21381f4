"""Aggregation base class.

TPU-native redesign of reference ``torch_geometric/nn/aggr/base.py:10``.
The reference dispatches between index-based ``scatter`` (atomics) and
ptr-based ``segment`` (sorted) backends; on TPU both lower through XLA
segment primitives (deterministic by construction — the reference's
deterministic-mode special case at ``base.py:65-67`` is the default here).
All entry points take a **static** ``dim_size``; ragged->padded helpers
take static ``max_num_elements`` (the reference enforces the same via its
``disable_dynamic_shapes`` decorator, ``nn/aggr/base.py:101``).
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax.numpy as jnp

from ...ops import scatter
from ...utils.dense import to_dense_batch


class Aggregation(fnn.Module):
    """Base for permutation-invariant set aggregations.

    Call signature (all subclasses): ``aggr(x, index, dim_size, mask=None,
    max_num_elements=None)`` where ``x`` is ``[N, F]`` (or ``[N]``),
    ``index`` assigns each row to a segment, ``dim_size`` is the static
    number of segments, and ``mask`` marks valid rows (padding support).
    """

    def __call__(self, x: jnp.ndarray, index: Optional[jnp.ndarray] = None,
                 dim_size: Optional[int] = None,
                 mask: Optional[jnp.ndarray] = None,
                 max_num_elements: Optional[int] = None) -> jnp.ndarray:
        if index is None:
            index = jnp.zeros((x.shape[0],), jnp.int32)
            dim_size = dim_size or 1
        if dim_size is None:
            raise ValueError('Aggregation requires a static dim_size')
        return self.forward(x, index, dim_size, mask, max_num_elements)

    def forward(self, x, index, dim_size, mask, max_num_elements):
        raise NotImplementedError

    # -- helpers (reference base.py:173-185 reduce / :187 to_dense_batch) ---
    def reduce(self, x: jnp.ndarray, index: jnp.ndarray, dim_size: int,
               reduce: str = 'sum',
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return scatter(x, index, dim_size, reduce=reduce, mask=mask)

    def to_dense(self, x: jnp.ndarray, index: jnp.ndarray, dim_size: int,
                 mask: Optional[jnp.ndarray] = None,
                 max_num_elements: Optional[int] = None,
                 fill_value: float = 0.0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Ragged -> padded ``[dim_size, L, F]`` + validity mask."""
        if max_num_elements is None:
            max_num_elements = int(x.shape[0])
        if mask is not None:
            index = jnp.where(mask, index, dim_size)
        dense, valid = to_dense_batch(x, index, dim_size + 1,
                                      max_num_elements,
                                      fill_value=fill_value)
        return dense[:dim_size], valid[:dim_size]
