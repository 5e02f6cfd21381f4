"""Continuous-kernel convolutions: GMMConv, SplineConv, NNConv, CGConv,
FeaStConv.

Reference files: ``nn/conv/gmm_conv.py`` (MoNet gaussian mixtures),
``spline_conv.py`` (B-spline kernels; reference uses the pyg-lib
``spline_basis``/``spline_weighting`` native kernels —
``spline_conv.py:16``), ``nn_conv.py`` (edge-conditioned), ``cg_conv.py``
(crystal graph), ``feast_conv.py``.
"""

from typing import Callable, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import scatter


class GMMConv(MessagePassing):
    """MoNet: messages weighted by K gaussian kernels over
    pseudo-coordinates (reference ``gmm_conv.py``)."""
    out_channels: int
    dim: int = 2
    kernel_size: int = 3
    aggr: str = 'mean'
    root_weight: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n = x_dst.shape[0]
        K = self.kernel_size
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], x_src.shape[0] - 1)
        dst = jnp.minimum(coo[1], n - 1)
        mu = self.param('mu', fnn.initializers.normal(1.0),
                        (K, self.dim))
        sigma = self.param('sigma', fnn.initializers.ones,
                           (K, self.dim))
        h = fnn.Dense(K * self.out_channels, use_bias=False,
                      name='lin')(x_src).reshape(-1, K, self.out_channels)
        d = edge_attr[:, None, :] - mu[None]              # [E, K, dim]
        # reference gmm_conv.py: exp(-0.5 sum d^2 / (EPS + sigma^2))
        w = jnp.exp((-0.5 * d ** 2
                     / (1e-15 + sigma[None] ** 2)).sum(-1))  # [E, K]
        msg = (h[src] * w[..., None]).sum(1)               # [E, C]
        out = scatter(msg, dst, n, self._aggr(), mask=edge_mask)
        if self.root_weight:
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='root')(x_dst)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out


def _bspline_basis(pseudo: jnp.ndarray, kernel_size: int,
                   degree: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Open uniform B-spline basis per dim for degree in {1, 2, 3}:
    returns (weights [E, dim, degree+1], indices [E, dim, degree+1]) —
    the TPU equivalent of pyg-lib ``spline_basis``
    (torch-spline-conv ``basis_cpu.cpp`` polynomials; reference
    boundary ``spline_conv.py:16``)."""
    m = degree
    k = kernel_size - m
    v = jnp.clip(pseudo, 0, 1) * max(k, 1)
    lo = jnp.floor(v).astype(jnp.int32)
    lo = jnp.minimum(lo, max(k - 1, 0))
    f = v - lo
    if m < 1:
        raise ValueError(f'spline degree must be >= 1, got {m}')
    # Uniform (cardinal) Cox-de Boor recursion — arbitrary degree, the
    # parity boundary of pyg-lib's runtime `degree` argument. Tap
    # weights N_j^m(f), j = 0..m, satisfy
    #   N_j^m = ((f+m-j)/m) N_{j-1}^{m-1} + ((1-f+j)/m) N_j^{m-1}.
    # The loop unrolls at trace time (m is static).
    ws = [jnp.ones_like(f)]
    for mm in range(1, m + 1):
        prev = ws
        ws = []
        for j in range(mm + 1):
            term = jnp.zeros_like(f)
            if 0 <= j - 1 < len(prev):
                term = term + ((f + mm - j) / mm) * prev[j - 1]
            if j < len(prev):
                term = term + ((1 - f + j) / mm) * prev[j]
            ws.append(term)
    w = jnp.stack(ws, -1)                               # [E, dim, m+1]
    idx = lo[..., None] + jnp.arange(m + 1)             # [E, dim, m+1]
    # corners past the last knot carry zero basis weight; clamp their
    # index and zero the weight for safety
    w = jnp.where(idx < kernel_size, w, 0.0)
    return w, jnp.minimum(idx, kernel_size - 1).astype(jnp.int32)


class SplineConv(MessagePassing):
    """B-spline kernel conv (reference ``spline_conv.py``; open
    splines, degree 1-3). Weight bank [K^dim, F_in, F_out]; per-edge
    weights from the tensor-product basis over (degree+1)^dim
    corners."""
    out_channels: int
    dim: int = 2
    kernel_size: int = 3
    degree: int = 1
    aggr: str = 'mean'
    root_weight: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n = x_dst.shape[0]
        f_in = x_src.shape[-1]
        K = self.kernel_size
        total = K ** self.dim
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], x_src.shape[0] - 1)
        dst = jnp.minimum(coo[1], n - 1)
        weight = self.param('weight', fnn.initializers.glorot_uniform(),
                            (total, f_in, self.out_channels))
        wb, ib = _bspline_basis(edge_attr[:, :self.dim], K, self.degree)
        # tensor-product over dims: enumerate the (degree+1)^dim corners
        base = self.degree + 1
        msg = jnp.zeros((coo.shape[1], self.out_channels))
        for corner in range(base ** self.dim):
            bits, c = [], corner
            for _ in range(self.dim):
                bits.append(c % base)
                c //= base
            w_c = jnp.ones((coo.shape[1],))
            idx_c = jnp.zeros((coo.shape[1],), jnp.int32)
            for d, b in enumerate(bits):
                w_c = w_c * wb[:, d, b]
                idx_c = idx_c * K + ib[:, d, b]
            w_edge = weight[idx_c]                       # [E, Fin, Fout]
            msg = msg + w_c[:, None] * jnp.einsum(
                'ef,efo->eo', x_src[src], w_edge)
        out = scatter(msg, dst, n, self._aggr(), mask=edge_mask)
        if self.root_weight:
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='root')(x_dst)
        return out + self.param('bias', fnn.initializers.zeros,
                                (self.out_channels,))


class NNConv(MessagePassing):
    """Edge-conditioned conv: per-edge weight matrix from an edge MLP
    (reference ``nn_conv.py``)."""
    out_channels: int
    nn: fnn.Module = None
    aggr: str = 'add'
    root_weight: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n = x_dst.shape[0]
        f_in = x_src.shape[-1]
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], x_src.shape[0] - 1)
        dst = jnp.minimum(coo[1], n - 1)
        w_edge = self.nn(edge_attr).reshape(-1, f_in, self.out_channels)
        msg = jnp.einsum('ef,efo->eo', x_src[src], w_edge)
        out = scatter(msg, dst, n, self._aggr(), mask=edge_mask)
        if self.root_weight:
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='root')(x_dst)
        return out


class CGConv(MessagePassing):
    """Crystal graph conv (reference ``cg_conv.py``):
    x' = x + sum sigmoid(W_f z) * softplus(W_s z), z = [x_i, x_j, e]."""
    channels: int
    dim: int = 0
    aggr: str = 'add'

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n = x_dst.shape[0]
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], x_src.shape[0] - 1)
        dst = jnp.minimum(coo[1], n - 1)
        z = [x_dst[dst], x_src[src]]
        if edge_attr is not None:
            z.append(edge_attr)
        z = jnp.concatenate(z, -1)
        f = jax.nn.sigmoid(fnn.Dense(self.channels, name='lin_f')(z))
        s = jax.nn.softplus(fnn.Dense(self.channels, name='lin_s')(z))
        out = scatter(f * s, dst, n, self._aggr(), mask=edge_mask)
        return x_dst + out


class FeaStConv(MessagePassing):
    """Feature-steered conv (reference ``feast_conv.py``):
    attention over H weight heads from feature differences.
    Self-loops are removed then re-added and messages MEAN-aggregated
    (reference ``feast_conv.py:55`` sets ``aggr='mean'``)."""
    out_channels: int
    heads: int = 1
    add_self_loops: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from .point_conv import _with_self_loops
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n = x_dst.shape[0]
        H = self.heads
        if self.add_self_loops:
            edge_index, edge_mask = _with_self_loops(edge_index,
                                                     edge_mask, n)
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], x_src.shape[0] - 1)
        dst = jnp.minimum(coo[1], n - 1)
        diff = x_src[src] - x_dst[dst]
        q = jax.nn.softmax(fnn.Dense(H, name='u')(diff), -1)  # [E, H]
        h = fnn.Dense(H * self.out_channels, use_bias=False,
                      name='lin')(x_src[src]).reshape(
            -1, H, self.out_channels)
        msg = (h * q[..., None]).sum(1)
        # reference feast_conv.py:55 sets aggr='mean'
        out = scatter(msg, dst, n, 'mean', mask=edge_mask)
        return out + self.param('bias', fnn.initializers.zeros,
                                (self.out_channels,))
