"""XConv — PointCNN's X-transformed convolution, reference-exact
(reference ``torch_geometric/nn/conv/x_conv.py:22-166``).

For each point: lift the K nearest neighbors' relative positions
through an MLP, learn a K x K transform from them (two grouped
full-width Conv1d stages), X-permute the lifted-plus-raw features and
run a depthwise-separable convolution. Everything is dense per-point
``[K, C]`` work — batched matmuls on the MXU; the only sparse piece is
the KNN graph, which comes from our tiled KNN kernel (the reference
needs ``torch_cluster.knn_graph``) or can be injected precomputed via
``neighbor_idx``.
"""

from math import ceil
from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp


class _DepthwiseFull(fnn.Module):
    """torch ``Conv1d(C, C*m, kernel_size=K, groups=C)`` on a length-K
    input (output length 1): out[n, c*m+j] = sum_s w[c*m+j, s] *
    h[n, c, s] + b. Weight stored reference-shaped [C*m, 1, K]."""
    out_per_in: int

    @fnn.compact
    def __call__(self, h):                       # [N, C, K]
        n, c, k = h.shape
        w = self.param('weight',
                       fnn.initializers.lecun_normal(),
                       (c * self.out_per_in, 1, k))
        b = self.param('bias', fnn.initializers.zeros,
                       (c * self.out_per_in,))
        hg = jnp.repeat(h, self.out_per_in, axis=1)   # ch o -> h[o // m]
        return (hg * w[:, 0, :][None]).sum(-1) + b    # [N, C*m]


class _BN(fnn.Module):
    """Eval-mode BatchNorm1d (running stats; reference modules are
    profiled/oracled in ``.eval()``)."""

    @fnn.compact
    def __call__(self, h):
        f = h.shape[-1]
        scale = self.param('weight', fnn.initializers.ones, (f,))
        bias = self.param('bias', fnn.initializers.zeros, (f,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((f,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((f,)))
        inv = jnp.reciprocal(jnp.sqrt(var.value + 1e-5))
        return (h - mean.value) * inv * scale + bias


class XConv(fnn.Module):
    """Reference ``x_conv.py`` architecture: mlp1 (lift), mlp2 (X
    transform via two grouped Conv1d), depthwise-separable final conv.
    ``neighbor_idx``: optional precomputed ``[N, K]`` neighbor indices
    (each row's K nearest including self — the reference's
    ``knn_graph(loop=True)``); when absent, our tiled KNN runs."""
    out_channels: int
    dim: int = 3
    kernel_size: int = 8
    hidden_channels: Optional[int] = None
    dilation: int = 1

    @fnn.compact
    def __call__(self, x: Optional[jnp.ndarray], pos: jnp.ndarray,
                 batch: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 neighbor_idx: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        n = pos.shape[0]
        K = self.kernel_size
        if x is not None:
            c_in = x.shape[-1]
            hid = self.hidden_channels or max(c_in // 4, 1)
        else:
            c_in = 0
            hid = self.hidden_channels or 1

        if neighbor_idx is None:
            from ..pool.point import knn
            ei, valid = knn(pos, pos, K * self.dilation, batch, batch,
                            mask, mask)
            idx = ei[1].reshape(n, K * self.dilation)
            vmask = valid.reshape(n, K * self.dilation)
            if self.dilation > 1:
                # reference: edge_index[:, ::dilation] — row-major
                # stride equals per-node stride at contiguous layout
                idx = idx[:, ::self.dilation]
                vmask = vmask[:, ::self.dilation]
            # invalid slots (padded/masked points, clouds smaller than
            # K*dilation) fall back to the CENTER point: rel = 0 and
            # own features — the degenerate self-loop knn_graph
            # (loop=True) effectively yields, instead of a clamped
            # arbitrary point's data
            idx = jnp.where(vmask, jnp.minimum(idx, n - 1),
                            jnp.arange(n)[:, None])
        else:
            idx = neighbor_idx

        rel = pos[idx] - pos[:, None, :]              # [N, K, D]

        # mlp1: Lin-ELU-BN-Lin-ELU-BN on [N*K, D] (reference :92-100)
        h = rel.reshape(n * K, self.dim)
        h = _BN(name='mlp1_bn0')(fnn.elu(
            fnn.Dense(hid, name='mlp1_lin0')(h)))
        h = _BN(name='mlp1_bn1')(fnn.elu(
            fnn.Dense(hid, name='mlp1_lin1')(h)))
        x_star = h.reshape(n, K, hid)
        if x is not None:
            x_star = jnp.concatenate([x_star, x[idx]], -1)
        x_star = jnp.swapaxes(x_star, 1, 2)           # [N, C, K]
        c = hid + c_in

        # mlp2: the K x K transform (reference :102-116)
        t = rel.reshape(n, K * self.dim)
        t = _BN(name='mlp2_bn0')(fnn.elu(
            fnn.Dense(K * K, name='mlp2_lin0')(t)))
        t = t.reshape(n, K, K)
        t = _DepthwiseFull(out_per_in=K, name='mlp2_conv0')(t)
        t = _BN(name='mlp2_bn1')(fnn.elu(t))
        t = t.reshape(n, K, K)
        t = _DepthwiseFull(out_per_in=K, name='mlp2_conv1')(t)
        t = _BN(name='mlp2_bn2')(t)
        transform = t.reshape(n, K, K)

        x_t = jnp.matmul(x_star, transform)           # [N, C, K]

        # final depthwise-separable conv (reference :118-124)
        m = int(ceil(self.out_channels / c))
        h = _DepthwiseFull(out_per_in=m, name='conv_dw')(x_t)
        return fnn.Dense(self.out_channels, name='conv_lin')(h)
