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


def _with_self_loops(edge_index, edge_mask, n: int):
    """remove_self_loops + add_self_loops, static-shape: existing loop
    edges are masked out and N fresh loops appended (reference
    ``point_conv.py:94-99`` and friends)."""
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    coo = jnp.asarray(coo)
    loop_free = coo[0] != coo[1]
    edge_mask = loop_free if edge_mask is None else (edge_mask & loop_free)
    loops = jnp.arange(n, dtype=coo.dtype)
    coo = jnp.concatenate([coo, jnp.stack([loops, loops])], axis=1)
    edge_mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)])
    return coo, edge_mask


class PointNetConv(MessagePassing):
    """h = local_nn([x_j, pos_j - pos_i]); out = global_nn(max_j h)
    (reference ``point_conv.py``)."""
    local_nn: Optional[fnn.Module] = None
    global_nn: Optional[fnn.Module] = None
    add_self_loops: bool = True      # reference point_conv.py:66
    aggr: str = 'max'

    def __call__(self, x, pos, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pos_src, pos_dst = pos if isinstance(pos, tuple) else (pos, pos)
        if self.add_self_loops:
            n = min(pos_src.shape[0], pos_dst.shape[0])
            edge_index, edge_mask = _with_self_loops(edge_index,
                                                     edge_mask, n)
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
    add_self_loops: bool = True      # reference ppf_conv.py:84
    aggr: str = 'max'

    def __call__(self, x, pos, normal, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pos_src, pos_dst = pos if isinstance(pos, tuple) else (pos, pos)
        nrm_src, nrm_dst = (normal if isinstance(normal, tuple)
                            else (normal, normal))
        if self.add_self_loops:
            n = min(pos_src.shape[0], pos_dst.shape[0])
            edge_index, edge_mask = _with_self_loops(edge_index,
                                                     edge_mask, n)
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
    add_self_loops: bool = True      # reference :63

    @fnn.compact
    def __call__(self, x, pos, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ...ops import scatter, softmax as segment_softmax
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        pos_src, pos_dst = pos if isinstance(pos, tuple) else (pos, pos)
        n_src, n_dst = pos_src.shape[0], pos_dst.shape[0]
        # reference point_transformer_conv.py:20-22: all three
        # projections are bias-free
        q = fnn.Dense(self.out_channels, use_bias=False,
                      name='lin_dst')(x_dst)
        k = fnn.Dense(self.out_channels, use_bias=False,
                      name='lin_src')(x_src)
        v = fnn.Dense(self.out_channels, use_bias=False,
                      name='lin')(x_src)
        if self.add_self_loops:
            edge_index, edge_mask = _with_self_loops(
                edge_index, edge_mask, min(n_src, n_dst))
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n_src - 1)
        dst = jnp.minimum(coo[1], n_dst - 1)
        # reference message: delta = pos_nn(pos_i - pos_j)
        delta = pos_dst[dst] - pos_src[src]
        if self.pos_nn is not None:
            delta = self.pos_nn(delta)
        else:
            delta = fnn.Dense(self.out_channels, name='pos_nn')(delta)
        alpha = q[dst] - k[src] + delta
        if self.attn_nn is not None:
            alpha = self.attn_nn(alpha)
        alpha = segment_softmax(alpha, dst, n_dst, mask=edge_mask)
        if edge_mask is not None:
            alpha = jnp.where(edge_mask[:, None], alpha, 0.0)
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
        from ..pool.point import knn
        from ...ops import scatter
        n = x.shape[0]
        s = fnn.Dense(self.space_dimensions, name='lin_s')(x)
        h = fnn.Dense(self.propagate_dimensions, name='lin_h')(x)
        # reference gravnet_conv.py:96: raw knn (self-match INCLUDED),
        # then flip -> (src=x-space neighbor, dst=query)
        qk, valid = knn(s, s, self.k, batch_x=batch, batch_y=batch,
                        mask_x=mask, mask_y=mask)
        dst, src = qk[0], qk[1]
        d2 = ((s[src] - s[dst]) ** 2).sum(-1)
        w = jnp.exp(-10.0 * d2)[:, None]
        msg = h[src] * w
        mean = scatter(msg, dst, n, 'mean', mask=valid)
        mx = scatter(msg, dst, n, 'max', mask=valid)
        # reference :103: lin_out1(x) (bias-free) + lin_out2([mean|max])
        return (fnn.Dense(self.out_channels, use_bias=False,
                          name='lin_out1')(x)
                + fnn.Dense(self.out_channels,
                            name='lin_out2')(
                                jnp.concatenate([mean, mx], -1)))
