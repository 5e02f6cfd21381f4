"""GraphSAGE convolution — reference ``nn/conv/sage_conv.py:13``."""

from typing import Optional, Tuple, Union

import flax.linen as fnn
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...edge_index import EdgeIndex
from ...ops import spmm


class SAGEConv(MessagePassing):
    """x'_i = W1 x_i + W2 mean_{j in N(i)} x_j, with optional pre-projection
    and l2-normalisation (reference ``sage_conv.py:13``, bipartite
    ``(x_src, x_dst)`` support)."""
    out_channels: int
    aggr: str = 'mean'
    normalize: bool = False
    root_weight: bool = True
    project: bool = False
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x: Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]],
                 edge_index,
                 edge_mask: Optional[jnp.ndarray] = None,
                 size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        if self.project:
            x_src = fnn.relu(fnn.Dense(x_src.shape[-1], name='lin_proj')(
                x_src))
        if size is None:
            size = (x_src.shape[0], x_dst.shape[0])

        out = self.propagate(edge_index, x=(x_src, x_dst), size=size,
                             edge_mask=edge_mask)
        out = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                        name='lin_l')(out)
        if self.root_weight and x_dst is not None:
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='lin_r')(x_dst)
        if self.normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out

    def message(self, x_j):
        return x_j

    def message_and_aggregate(self, edge_index, x=None, **kwargs):
        # reference sage_conv.py:149 — fused mean-SpMM
        if not isinstance(edge_index, EdgeIndex) or edge_index.csc is None:
            return NotImplemented
        x_src, _ = x if isinstance(x, tuple) else (x, x)
        return spmm(edge_index, x_src, reduce=self._aggr())
