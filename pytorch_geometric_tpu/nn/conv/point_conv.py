"""Point-cloud / mesh convolutions.

Reference files: ``nn/conv/point_conv.py`` (PointNetConv),
``edge_conv.py`` (EdgeConv, DynamicEdgeConv), ``ppf_conv.py`` (PPFConv),
``point_transformer_conv.py``, ``gravnet_conv.py``.
Dynamic graph construction uses the fixed-k ``knn_graph`` from
``nn/pool/point.py`` (static shapes).
"""

from typing import Callable, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing


class PointNetConv(MessagePassing):
    """h = local_nn([x_j, pos_j - pos_i]); out = global_nn(max_j h)
    (reference ``point_conv.py``)."""
    local_nn: Optional[fnn.Module] = None
    global_nn: Optional[fnn.Module] = None
    add_self_loops_flag: bool = False
    aggr: str = 'max'

    def __call__(self, x, pos, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pos_src, pos_dst = pos if isinstance(pos, tuple) else (pos, pos)
        out = self.propagate(edge_index, x=x, pos=(pos_src, pos_dst),
                             size=(pos_src.shape[0], pos_dst.shape[0]),
                             edge_mask=edge_mask)
        if self.global_nn is not None:
            out = self.global_nn(out)
        return out

    def message(self, pos_j, pos_i, x_j=None):
        msg = pos_j - pos_i
        if x_j is not None:
            msg = jnp.concatenate([x_j, msg], -1)
        if self.local_nn is not None:
            msg = self.local_nn(msg)
        return msg


class EdgeConv(MessagePassing):
    """h = nn([x_i, x_j - x_i]), max-aggregated (reference ``edge_conv.py``)."""
    nn: fnn.Module
    aggr: str = 'max'

    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        return self.propagate(edge_index, x=(x_src, x_dst),
                              size=(x_src.shape[0], x_dst.shape[0]),
                              edge_mask=edge_mask)

    def message(self, x_i, x_j):
        return self.nn(jnp.concatenate([x_i, x_j - x_i], -1))


class DynamicEdgeConv(MessagePassing):
    """EdgeConv over a per-forward k-NN graph
    (reference ``edge_conv.py:DynamicEdgeConv``)."""
    nn: fnn.Module
    k: int = 6
    aggr: str = 'max'

    def __call__(self, x, batch: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..pool.point import knn_graph
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        coo, valid = knn_graph(x_src, self.k, batch=batch, mask=mask)
        return self.propagate(coo, x=(x_src, x_dst),
                              size=(x_src.shape[0], x_dst.shape[0]),
                              edge_mask=valid)

    def message(self, x_i, x_j):
        return self.nn(jnp.concatenate([x_i, x_j - x_i], -1))


class PPFConv(MessagePassing):
    """Point-pair-feature conv (reference ``ppf_conv.py``): rotation-
    invariant [d, angle(n_i,d), angle(n_j,d), angle(n_i,n_j)] features."""
    local_nn: Optional[fnn.Module] = None
    global_nn: Optional[fnn.Module] = None
    aggr: str = 'max'

    def __call__(self, x, pos, normal, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pos_src, pos_dst = pos if isinstance(pos, tuple) else (pos, pos)
        nrm_src, nrm_dst = (normal if isinstance(normal, tuple)
                            else (normal, normal))
        out = self.propagate(edge_index, x=x, pos=(pos_src, pos_dst),
                             normal=(nrm_src, nrm_dst),
                             size=(pos_src.shape[0], pos_dst.shape[0]),
                             edge_mask=edge_mask)
        if self.global_nn is not None:
            out = self.global_nn(out)
        return out

    @staticmethod
    def _angle(v1, v2):
        cross = jnp.linalg.norm(jnp.cross(v1, v2), axis=-1)
        dot = (v1 * v2).sum(-1)
        return jnp.arctan2(cross, dot)

    def message(self, pos_i, pos_j, normal_i, normal_j, x_j=None):
        d = pos_j - pos_i
        dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
        ppf = jnp.concatenate([
            dist,
            self._angle(normal_i, d)[:, None],
            self._angle(normal_j, d)[:, None],
            self._angle(normal_i, normal_j)[:, None],
        ], -1)
        if x_j is not None:
            ppf = jnp.concatenate([x_j, ppf], -1)
        if self.local_nn is not None:
            ppf = self.local_nn(ppf)
        return ppf


class PointTransformerConv(MessagePassing):
    """Point transformer attention (reference
    ``point_transformer_conv.py``): alpha = mlp(q_i - k_j + delta),
    out = sum softmax(alpha) * (v_j + delta)."""
    out_channels: int
    pos_nn: Optional[fnn.Module] = None
    attn_nn: Optional[fnn.Module] = None

    @fnn.compact
    def __call__(self, x, pos, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ...ops import scatter, softmax as segment_softmax
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        pos_src, pos_dst = pos if isinstance(pos, tuple) else (pos, pos)
        n_src, n_dst = pos_src.shape[0], pos_dst.shape[0]
        q = fnn.Dense(self.out_channels, name='lin_q')(x_dst)
        k = fnn.Dense(self.out_channels, name='lin_k')(x_src)
        v = fnn.Dense(self.out_channels, name='lin_v')(x_src)
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n_src - 1)
        dst = jnp.minimum(coo[1], n_dst - 1)
        delta = pos_src[src] - pos_dst[dst]
        if self.pos_nn is not None:
            delta = self.pos_nn(delta)
        else:
            delta = fnn.Dense(self.out_channels, name='pos_enc')(delta)
        alpha = q[dst] - k[src] + delta
        if self.attn_nn is not None:
            alpha = self.attn_nn(alpha)
        alpha = segment_softmax(alpha, dst, n_dst, mask=edge_mask)
        msg = alpha * (v[src] + delta)
        return scatter(msg, dst, n_dst, 'sum', mask=edge_mask)


class GravNetConv(MessagePassing):
    """GravNet (reference ``gravnet_conv.py``): learned coordinate space,
    kNN by distance, messages weighted by exp(-10 d^2)."""
    out_channels: int
    space_dimensions: int = 4
    propagate_dimensions: int = 16
    k: int = 4

    @fnn.compact
    def __call__(self, x, batch: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..pool.point import knn_graph
        from ...ops import scatter
        n = x.shape[0]
        s = fnn.Dense(self.space_dimensions, name='lin_s')(x)
        h = fnn.Dense(self.propagate_dimensions, name='lin_h')(x)
        coo, valid = knn_graph(s, self.k, batch=batch, mask=mask,
                               flow='source_to_target')
        src, dst = coo[0], coo[1]
        d2 = ((s[src] - s[dst]) ** 2).sum(-1)
        w = jnp.exp(-10.0 * d2)[:, None]
        msg = h[src] * w
        mean = scatter(msg, dst, n, 'mean', mask=valid)
        mx = scatter(msg, dst, n, 'max', mask=valid)
        out = jnp.concatenate([x, mean, mx], -1)
        return fnn.Dense(self.out_channels, name='lin_out')(out)
