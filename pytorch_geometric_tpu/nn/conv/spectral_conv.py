"""Spectral / multi-hop propagation convolutions.

Covers (reference files under ``torch_geometric/nn/conv/``):
ChebConv (``cheb_conv.py``), ARMAConv (``arma_conv.py``), SGConv
(``sg_conv.py``), SSGConv (``ssg_conv.py``), TAGConv (``tag_conv.py``),
APPNP (``appnp.py``), MixHopConv (``mixhop_conv.py``).
All K-hop recurrences are static Python loops — XLA unrolls and pipelines
the SpMM chain.
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...edge_index import EdgeIndex
from ...ops import scatter
from .gcn_conv import gcn_norm


def _coo(edge_index):
    return edge_index.coo if isinstance(edge_index, EdgeIndex) else edge_index


class _PropMixin:
    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[:, None] * x_j


class ChebConv(_PropMixin, MessagePassing):
    """Chebyshev spectral conv of order K (reference ``cheb_conv.py``):
    sum_k W_k T_k(L_hat) x with L_hat = 2L/lambda_max - I."""
    out_channels: int
    K: int = 2
    normalization: str = 'sym'
    use_bias: bool = True

    def _norm(self, coo, num_nodes, edge_weight, lambda_max, edge_mask):
        from ...utils.core import degree
        w = (jnp.ones((coo.shape[1],), jnp.float32)
             if edge_weight is None else edge_weight)
        if edge_mask is not None:
            w = jnp.where(edge_mask, w, 0)
        # reference get_laplacian removes self loops up front
        w = jnp.where(coo[0] == coo[1], 0.0, w)
        src = jnp.minimum(coo[0], num_nodes - 1)
        dst = jnp.minimum(coo[1], num_nodes - 1)
        # reference get_laplacian computes degrees over the SOURCE
        # endpoint (utils/laplacian.py: scatter over row)
        deg = scatter(w, src, num_nodes, 'sum')
        if self.normalization == 'sym':
            dis = jnp.where(deg > 0,
                            jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
            lw = -dis[src] * w * dis[dst]
        else:  # 'rw'
            dinv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
            lw = -dinv[dst] * w
        # L_hat edge weights: (2/lambda_max) * L, diag shift -1 applied as
        # an extra self-term handled in the recurrence.
        return (2.0 / lambda_max) * lw

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 lambda_max: float = 2.0,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo = _coo(edge_index)
        lw = self._norm(coo, n, edge_weight, lambda_max, edge_mask)
        diag = (2.0 / lambda_max) - 1.0  # D-normalised diag minus identity
        # (self-loop edges were zeroed inside _norm — the reference's
        # get_laplacian removes them before normalising)

        def lhat(v):
            return (self.propagate(coo, x=v, edge_weight=lw, size=(n, n),
                                   edge_mask=edge_mask) + diag * v)

        tx0 = x
        out = fnn.Dense(self.out_channels, use_bias=False, name='lin_0')(tx0)
        if self.K > 1:
            tx1 = lhat(x)
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='lin_1')(tx1)
            for k in range(2, self.K):
                tx2 = 2 * lhat(tx1) - tx0
                out = out + fnn.Dense(self.out_channels, use_bias=False,
                                      name=f'lin_{k}')(tx2)
                tx0, tx1 = tx1, tx2
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out


class ARMAConv(MessagePassing):
    """ARMA_K filter stacks (reference ``arma_conv.py``):
    x_k^{(t+1)} = act(A_hat x_k^t W + x^{(0)} V); output = mean_k."""
    out_channels: int
    num_stacks: int = 1
    num_layers: int = 1
    shared_weights: bool = False
    act: str = 'relu'
    dropout: float = 0.0
    use_bias: bool = True

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[..., None] * x_j

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo, ew = gcn_norm(_coo(edge_index), edge_weight, n,
                           add_self_loops=False)
        act = getattr(jax.nn, self.act)
        outs = []
        for k in range(self.num_stacks):
            h = x
            for t in range(self.num_layers):
                wname = (f'stack_{k}_w_shared' if self.shared_weights and
                         t > 0 else f'stack_{k}_w_{t}')
                h = fnn.Dense(self.out_channels, use_bias=False,
                              name=wname)(h)
                h = self.propagate(coo, x=h, edge_weight=ew, size=(n, n),
                                   edge_mask=edge_mask)
                vname = (f'stack_{k}_v_shared' if self.shared_weights and
                         t > 0 else f'stack_{k}_v_{t}')
                root = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                                 name=vname)(x)
                h = act(h + root)
            outs.append(h)
        return jnp.stack(outs, 0).mean(0)


class SGConv(_PropMixin, MessagePassing):
    """Simplified GCN: W (A_hat^K x) (reference ``sg_conv.py``)."""
    out_channels: int
    K: int = 1
    add_self_loops: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo, ew = gcn_norm(_coo(edge_index), edge_weight, n,
                           add_self_loops=self.add_self_loops)
        if edge_mask is not None:
            edge_mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)]) \
                if self.add_self_loops else edge_mask
        for _ in range(self.K):
            x = self.propagate(coo, x=x, edge_weight=ew, size=(n, n),
                               edge_mask=edge_mask)
        return fnn.Dense(self.out_channels, use_bias=self.use_bias,
                         name='lin')(x)


class SSGConv(_PropMixin, MessagePassing):
    """Simple spectral GCN (reference ``ssg_conv.py``):
    W (alpha x + (1-alpha)/K sum_k A_hat^k x)."""
    out_channels: int
    alpha: float = 0.1
    K: int = 1
    add_self_loops: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo, ew = gcn_norm(_coo(edge_index), edge_weight, n,
                           add_self_loops=self.add_self_loops)
        if edge_mask is not None and self.add_self_loops:
            edge_mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)])
        h = x
        acc = jnp.zeros_like(x)
        for _ in range(self.K):
            h = self.propagate(coo, x=h, edge_weight=ew, size=(n, n),
                               edge_mask=edge_mask)
            acc = acc + h
        out = self.alpha * x + (1 - self.alpha) * acc / self.K
        return fnn.Dense(self.out_channels, use_bias=self.use_bias,
                         name='lin')(out)


class TAGConv(_PropMixin, MessagePassing):
    """Topology-adaptive GCN: sum_k W_k A_hat^k x
    (reference ``tag_conv.py``)."""
    out_channels: int
    K: int = 3
    normalize: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo = _coo(edge_index)
        if self.normalize:
            coo, edge_weight = gcn_norm(coo, edge_weight, n,
                                        add_self_loops=False)
        out = fnn.Dense(self.out_channels, use_bias=False, name='lin_0')(x)
        h = x
        for k in range(1, self.K + 1):
            h = self.propagate(coo, x=h, edge_weight=edge_weight,
                               size=(n, n), edge_mask=edge_mask)
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name=f'lin_{k}')(h)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out


class APPNP(_PropMixin, MessagePassing):
    """Approximate personalized PageRank propagation
    (reference ``appnp.py``): z^{k+1} = (1-alpha) A_hat z^k + alpha x."""
    K: int = 10
    alpha: float = 0.1
    add_self_loops: bool = True
    dropout: float = 0.0

    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo, ew = gcn_norm(_coo(edge_index), edge_weight, n,
                           add_self_loops=self.add_self_loops)
        if edge_mask is not None and self.add_self_loops:
            edge_mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)])
        h = x
        for _ in range(self.K):
            h = self.propagate(coo, x=h, edge_weight=ew, size=(n, n),
                               edge_mask=edge_mask)
            h = (1 - self.alpha) * h + self.alpha * x
        return h


class MixHopConv(_PropMixin, MessagePassing):
    """Mix powers of the adjacency: concat_p A_hat^p x W_p
    (reference ``mixhop_conv.py``)."""
    out_channels: int
    powers: Tuple[int, ...] = (0, 1, 2)
    add_self_loops: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo, ew = gcn_norm(_coo(edge_index), edge_weight, n,
                           add_self_loops=self.add_self_loops)
        if edge_mask is not None and self.add_self_loops:
            edge_mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)])
        outs = []
        h = x
        for p in range(max(self.powers) + 1):
            if p > 0:
                h = self.propagate(coo, x=h, edge_weight=ew, size=(n, n),
                                   edge_mask=edge_mask)
            if p in self.powers:
                # reference mixhop_conv.py:71: per-power lins are
                # bias-free; one shared bias over the concat output
                outs.append(fnn.Dense(self.out_channels, use_bias=False,
                                      name=f'lin_{p}')(h))
        out = jnp.concatenate(outs, axis=-1)
        if self.use_bias:
            out = out + self.param(
                'bias', fnn.initializers.zeros,
                (len(self.powers) * self.out_channels,))
        return out
