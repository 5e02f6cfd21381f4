"""Fused sampled (gather-)binary ops.

Reference boundary: ``pyg_lib.ops.sampled_add/sub/mul/div`` (surfaced by
``torch_geometric/typing.py:64`` ``WITH_SAMPLED_OP``):

    out[i] = left[left_index[i]] (op) right[right_index[i]]

without materialising the two gathered intermediates. On TPU the fusion
is XLA's job — the gathers and the elementwise op compile into one
HBM-bandwidth-bound fused loop under ``jit``; these wrappers add the
index-optional semantics and a padding-safe gather (out-of-range index
rows produce the identity of the op, so padded edge slots stay inert).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ['sampled_add', 'sampled_sub', 'sampled_mul', 'sampled_div',
           'sampled_op']


def _gather(x: jnp.ndarray, index: Optional[jnp.ndarray],
            fill: float) -> jnp.ndarray:
    if index is None:
        return x
    n = x.shape[0]
    safe = jnp.minimum(index, n - 1)
    out = x[safe]
    keep = (index < n).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(keep, out, jnp.asarray(fill, x.dtype))


@partial(jax.jit, static_argnames=('op',))
def sampled_op(left: jnp.ndarray, right: jnp.ndarray,
               left_index: Optional[jnp.ndarray] = None,
               right_index: Optional[jnp.ndarray] = None,
               op: str = 'add') -> jnp.ndarray:
    """``left[left_index] (op) right[right_index]`` in one fused kernel.

    ``None`` index means "use all rows" (identity gather). Out-of-range
    (padding) indices contribute the op's identity element.
    """
    iden = {'add': 0.0, 'sub': 0.0, 'mul': 1.0, 'div': 1.0}[op]
    a = _gather(left, left_index, iden)
    b = _gather(right, right_index, iden)
    if op == 'add':
        return a + b
    if op == 'sub':
        return a - b
    if op == 'mul':
        return a * b
    return a / b


def sampled_add(left, right, left_index=None, right_index=None):
    return sampled_op(left, right, left_index, right_index, op='add')


def sampled_sub(left, right, left_index=None, right_index=None):
    return sampled_op(left, right, left_index, right_index, op='sub')


def sampled_mul(left, right, left_index=None, right_index=None):
    return sampled_op(left, right, left_index, right_index, op='mul')


def sampled_div(left, right, left_index=None, right_index=None):
    return sampled_op(left, right, left_index, right_index, op='div')
