"""Linear / HeteroLinear / HeteroDictLinear.

Reference: ``torch_geometric/nn/dense/linear.py`` — ``HeteroLinear``
(``:255``) dispatches to ``pyg_lib.ops.segment_matmul`` (CUTLASS grouped
GEMM) on CUDA. TPU-native equivalent: one batched einsum against the
``[T, F, F']`` weight bank with a per-row gather of the type-specific
result — a single MXU pass, no ragged grouping needed (see SURVEY.md
segment_matmul row). For strongly skewed type distributions a
sorted-by-type two-level variant can be added later without API change.
"""

from typing import Dict, Optional, Sequence

import flax.linen as fnn
import jax.numpy as jnp


class Linear(fnn.Module):
    """Lazy-input Dense (reference ``nn/dense/linear.py:Linear``; flax
    infers in_channels at init, matching the reference's -1 semantics)."""
    out_channels: int
    use_bias: bool = True
    weight_initializer: str = 'glorot'

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = (fnn.initializers.glorot_uniform()
                if self.weight_initializer == 'glorot'
                else fnn.initializers.kaiming_uniform())
        return fnn.Dense(self.out_channels, use_bias=self.use_bias,
                         kernel_init=init, name='lin')(x)


class HeteroLinear(fnn.Module):
    """Per-type linear: out[i] = x[i] @ W[type[i]]
    (reference ``linear.py:255``)."""
    out_channels: int
    num_types: int
    use_bias: bool = True
    is_sorted: bool = False   # kept for API parity; layout-independent here

    @fnn.compact
    def __call__(self, x: jnp.ndarray, type_vec: jnp.ndarray,
                 typed_layout=None) -> jnp.ndarray:
        from ...ops.grouped import typed_matmul
        f = x.shape[-1]
        w = self.param('weight', fnn.initializers.glorot_uniform(),
                       (self.num_types, f, self.out_channels))
        # Typed GEMM (TPU segment_matmul): dense einsum for small type
        # counts; pass a host-built ``build_ragged_layout(...)`` for the
        # lax.ragged_dot grouped GEMM (zero padding FLOPs) or
        # ``build_typed_layout(...)`` for sort-and-batch when num_types
        # is large/skewed.
        out = typed_matmul(x, type_vec, w, typed_layout)
        if self.use_bias:
            b = self.param('bias', fnn.initializers.zeros,
                           (self.num_types, self.out_channels))
            out = out + b[type_vec]
        return out


class HeteroDictLinear(fnn.Module):
    """Dict-of-types linear (reference ``linear.py:HeteroDictLinear``)."""
    out_channels: int
    types: Sequence[str] = ()
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x_dict: Dict[str, jnp.ndarray]
                 ) -> Dict[str, jnp.ndarray]:
        return {
            t: fnn.Dense(self.out_channels, use_bias=self.use_bias,
                         kernel_init=fnn.initializers.glorot_uniform(),
                         name=f'lin_{t}')(x)
            for t, x in x_dict.items()
        }
