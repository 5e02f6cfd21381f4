"""GIN / GINE convolutions — reference ``nn/conv/gin_conv.py``."""

from typing import Callable, Optional, Tuple

import flax.linen as fnn
import jax.numpy as jnp

from ..message_passing import MessagePassing


class GINConv(MessagePassing):
    """x' = MLP((1 + eps) x + sum_j x_j) (reference ``gin_conv.py:GINConv``).

    ``mlp``: any flax Module (e.g. our models.MLP). ``train_eps`` makes
    eps a learned parameter (init ``eps_init``).
    """
    mlp: fnn.Module
    eps_init: float = 0.0
    train_eps: bool = False
    aggr: str = 'sum'

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None,
                 size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        if size is None:
            size = (x_src.shape[0], x_dst.shape[0])
        out = self.propagate(edge_index, x=(x_src, x_dst), size=size,
                             edge_mask=edge_mask)
        if self.train_eps:
            eps = self.param('eps', lambda k: jnp.asarray(self.eps_init))
        else:
            eps = self.eps_init
        if x_dst is not None:
            out = out + (1 + eps) * x_dst
        return self.mlp(out)

    def message_and_aggregate(self, edge_index, x=None, **kwargs):
        # fused sum-SpMM (message is the identity x_j): routes through
        # the cached dense/BSR MXU adjacency when present
        from ...edge_index import EdgeIndex
        from ...ops import spmm
        if not isinstance(edge_index, EdgeIndex) or edge_index.csc is None:
            return NotImplemented
        x_src, _ = x if isinstance(x, tuple) else (x, x)
        return spmm(edge_index, x_src, reduce=self._aggr())


class GINEConv(MessagePassing):
    """GIN with edge features: message = relu(x_j + W edge_attr)
    (reference ``gin_conv.py:GINEConv``)."""
    mlp: fnn.Module
    eps_init: float = 0.0
    train_eps: bool = False
    edge_dim: Optional[int] = None
    aggr: str = 'sum'

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None,
                 size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        if size is None:
            size = (x_src.shape[0], x_dst.shape[0])
        if edge_attr.shape[-1] != x_src.shape[-1]:
            edge_attr = fnn.Dense(x_src.shape[-1], name='lin_edge')(edge_attr)
        out = self.propagate(edge_index, x=(x_src, x_dst),
                             edge_attr=edge_attr, size=size,
                             edge_mask=edge_mask)
        if self.train_eps:
            eps = self.param('eps', lambda k: jnp.asarray(self.eps_init))
        else:
            eps = self.eps_init
        if x_dst is not None:
            out = out + (1 + eps) * x_dst
        return self.mlp(out)

    def message(self, x_j, edge_attr):
        return fnn.relu(x_j + edge_attr)
