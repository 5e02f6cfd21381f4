"""Dense (padded-batch) convolutions over ``[B, N, F]`` + ``[B, N, N]``.

Reference: ``torch_geometric/nn/dense/{dense_gcn_conv,dense_sage_conv,
dense_gin_conv,dense_gat_conv,dense_graph_conv}.py``. These operate on
padded adjacency — the natively TPU-friendly layout (straight batched
MXU matmuls).
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp


def _mask_x(x, mask):
    return x if mask is None else x * mask[..., None]


class DenseGCNConv(fnn.Module):
    """Dense GCN (reference ``dense_gcn_conv.py``)."""
    out_channels: int
    improved: bool = False
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, adj, mask: Optional[jnp.ndarray] = None,
                 add_loop: bool = True) -> jnp.ndarray:
        B, N, _ = x.shape
        if add_loop:
            eye = jnp.eye(N, dtype=adj.dtype)
            adj = adj * (1 - eye) + (2.0 if self.improved else 1.0) * eye
        x = fnn.Dense(self.out_channels, use_bias=False, name='lin')(x)
        deg = adj.sum(-1)
        dis = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        adj = dis[..., None] * adj * dis[..., None, :]
        out = adj @ x
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return _mask_x(out, mask)


class DenseSAGEConv(fnn.Module):
    """Dense GraphSAGE (reference ``dense_sage_conv.py``)."""
    out_channels: int
    normalize: bool = False
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, adj, mask: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        mean = (adj @ x) / jnp.maximum(adj.sum(-1, keepdims=True), 1.0)
        # reference dense_sage_conv.py: bias lives on lin_root
        out = (fnn.Dense(self.out_channels, use_bias=False,
                         name='lin_rel')(mean)
               + fnn.Dense(self.out_channels, use_bias=self.use_bias,
                           name='lin_root')(x))
        if self.normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return _mask_x(out, mask)


class DenseGINConv(fnn.Module):
    """Dense GIN (reference ``dense_gin_conv.py``)."""
    nn: fnn.Module
    eps_init: float = 0.0
    train_eps: bool = False

    @fnn.compact
    def __call__(self, x, adj, mask: Optional[jnp.ndarray] = None,
                 add_loop: bool = True) -> jnp.ndarray:
        out = adj @ x
        eps = (self.param('eps', lambda k: jnp.asarray(self.eps_init))
               if self.train_eps else self.eps_init)
        if add_loop:
            out = out + (1 + eps) * x
        return _mask_x(self.nn(out), mask)


class DenseGraphConv(fnn.Module):
    """Dense GraphConv (reference ``dense_graph_conv.py``)."""
    out_channels: int
    aggr: str = 'add'
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, adj, mask: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        agg = adj @ x
        if self.aggr == 'mean':
            agg = agg / jnp.maximum(adj.sum(-1, keepdims=True), 1.0)
        out = (fnn.Dense(self.out_channels, use_bias=self.use_bias,
                         name='lin_rel')(agg)
               + fnn.Dense(self.out_channels, use_bias=False,
                           name='lin_root')(x))
        return _mask_x(out, mask)


class DenseGATConv(fnn.Module):
    """Dense GAT (reference ``dense_gat_conv.py``)."""
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, adj, mask: Optional[jnp.ndarray] = None,
                 add_loop: bool = True) -> jnp.ndarray:
        B, N, _ = x.shape
        H, C = self.heads, self.out_channels
        if add_loop:
            adj = jnp.maximum(adj, jnp.eye(N, dtype=adj.dtype))
        h = fnn.Dense(H * C, use_bias=False, name='lin')(x).reshape(
            B, N, H, C)
        a_src = self.param('att_src', fnn.initializers.glorot_uniform(),
                           (1, 1, H, C))
        a_dst = self.param('att_dst', fnn.initializers.glorot_uniform(),
                           (1, 1, H, C))
        e_src = (h * a_src).sum(-1)   # [B, N, H]
        e_dst = (h * a_dst).sum(-1)
        # alpha[b, i, j, h] for edge j->i
        e = e_dst[:, :, None, :] + e_src[:, None, :, :]
        e = fnn.leaky_relu(e, self.negative_slope)
        neg = jnp.finfo(e.dtype).min
        e = jnp.where((adj > 0)[..., None], e, neg)
        alpha = jax.nn.softmax(e, axis=2)
        alpha = jnp.where((adj > 0)[..., None], alpha, 0)
        out = jnp.einsum('bijh,bjhc->bihc', alpha, h)
        out = (out.reshape(B, N, H * C) if self.concat
               else out.mean(2))
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (H * C if self.concat else C,))
        return _mask_x(out, mask)
