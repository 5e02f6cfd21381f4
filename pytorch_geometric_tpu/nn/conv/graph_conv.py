"""Simple neighborhood-aggregation convolutions.

Covers (reference files under ``torch_geometric/nn/conv/``):
GraphConv (``graph_conv.py``), ResGatedGraphConv
(``res_gated_graph_conv.py``), GatedGraphConv (``gated_graph_conv.py``),
LEConv (``le_conv.py``), MFConv (``mf_conv.py``), FAConv (``fa_conv.py``),
AGNNConv (``agnn_conv.py``), ClusterGCNConv (``cluster_gcn_conv.py``),
WLConvContinuous (``wl_conv_continuous.py``), LGConv (``lg_conv.py``).
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...edge_index import EdgeIndex
from ...ops import scatter
from ...utils.core import degree


def _coo(edge_index):
    return edge_index.coo if isinstance(edge_index, EdgeIndex) else edge_index


class GraphConv(MessagePassing):
    """x' = W1 x + W2 * aggr_j w_ij x_j (reference ``graph_conv.py``)."""
    out_channels: int
    aggr: str = 'add'
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        if size is None:
            size = (x_src.shape[0], x_dst.shape[0])
        out = self.propagate(edge_index, x=(x_src, x_dst),
                             edge_weight=edge_weight, size=size,
                             edge_mask=edge_mask)
        out = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                        name='lin_rel')(out)
        if x_dst is not None:
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='lin_root')(x_dst)
        return out

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[:, None] * x_j


class ResGatedGraphConv(MessagePassing):
    """Gated: x' = W1 x_i + sum_j eta_ij * W2 x_j,
    eta = sigmoid(W3 x_i + W4 x_j) (reference ``res_gated_graph_conv.py``)."""
    out_channels: int
    act: str = 'sigmoid'
    root_weight: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        k = fnn.Dense(self.out_channels, name='lin_key')(x_dst)     # W3 x_i
        q = fnn.Dense(self.out_channels, name='lin_query')(x_src)   # W4 x_j
        v = fnn.Dense(self.out_channels, name='lin_value')(x_src)   # W2 x_j
        out = self.propagate(edge_index, k=k, q=q, v=v,
                             size=(x_src.shape[0], x_dst.shape[0]),
                             edge_mask=edge_mask)
        if self.root_weight:
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name='lin_skip')(x_dst)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out

    def message(self, k_i, q_j, v_j):
        return jax.nn.sigmoid(k_i + q_j) * v_j


class GatedGraphConv(MessagePassing):
    """GRU-iterated conv (Li et al.; reference ``gated_graph_conv.py``)."""
    out_channels: int
    num_layers: int = 1
    aggr: str = 'add'

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, f = x.shape
        if f > self.out_channels:
            raise ValueError('input channels must be <= out_channels')
        if f < self.out_channels:
            x = jnp.pad(x, ((0, 0), (0, self.out_channels - f)))
        weight = self.param('weight', fnn.initializers.glorot_uniform(),
                            (self.num_layers, self.out_channels,
                             self.out_channels))
        cell = fnn.GRUCell(features=self.out_channels, name='rnn')
        for i in range(self.num_layers):
            m = x @ weight[i]
            m = self.propagate(edge_index, x=m, edge_weight=edge_weight,
                               size=(n, n), edge_mask=edge_mask)
            x, _ = cell(x, m)
        return x

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[:, None] * x_j


class LEConv(MessagePassing):
    """Local extremum conv (reference ``le_conv.py:58-76``):
    x'_i = W3 x_i + sum_j w_ji (W1 x_j - W2 x_i)."""
    out_channels: int
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        a = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                      name='lin1')(x_src)
        b = fnn.Dense(self.out_channels, use_bias=False, name='lin2')(x_dst)
        out = self.propagate(edge_index, a=a, b=b, edge_weight=edge_weight,
                             size=(x_src.shape[0], x_dst.shape[0]),
                             edge_mask=edge_mask)
        return out + fnn.Dense(self.out_channels, use_bias=self.use_bias,
                               name='lin3')(x_dst)

    def message(self, a_j, b_i, edge_weight=None):
        m = a_j - b_i
        return m if edge_weight is None else edge_weight[:, None] * m


class MFConv(MessagePassing):
    """Degree-specific weights (molecular fingerprints;
    reference ``mf_conv.py``)."""
    out_channels: int
    max_degree: int = 10
    aggr: str = 'add'

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n_dst = x_dst.shape[0]
        coo = _coo(edge_index)
        deg = degree(coo[1], n_dst, mask=edge_mask).astype(jnp.int32)
        deg = jnp.minimum(deg, self.max_degree)
        h = self.propagate(edge_index, x=(x_src, x_dst),
                           size=(x_src.shape[0], n_dst),
                           edge_mask=edge_mask)
        # one weight bank per degree bucket; select per node
        outs = []
        for d in range(self.max_degree + 1):
            o = (fnn.Dense(self.out_channels, name=f'lin_l_{d}')(h)
                 + fnn.Dense(self.out_channels, use_bias=False,
                             name=f'lin_r_{d}')(x_dst))
            outs.append(o)
        stacked = jnp.stack(outs, 0)                      # [D+1, N, F]
        return jnp.take_along_axis(
            stacked, deg[None, :, None].astype(jnp.int32), axis=0)[0]


class FAConv(MessagePassing):
    """Frequency-adaptive conv (reference ``fa_conv.py:205-217``):
    alpha_ij = tanh(gl^T x_j + gr^T x_i),
    x' = eps*x0 + sum_j alpha_ij/sqrt(d_i d_j) x_j with GCN-style
    self-loop-augmented degrees."""
    eps: float = 0.1
    add_self_loops: bool = True
    normalize: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 x_0: Optional[jnp.ndarray] = None,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from .gcn_conv import gcn_norm
        if x_0 is None:
            x_0 = x
        n = x.shape[0]
        coo = _coo(edge_index)
        if self.normalize:
            coo, edge_weight = gcn_norm(coo, None, n,
                                        add_self_loops=self.add_self_loops)
            if edge_mask is not None and self.add_self_loops:
                edge_mask = jnp.concatenate([edge_mask,
                                             jnp.ones((n,), bool)])
        al = fnn.Dense(1, use_bias=False, name='att_l')(x)[:, 0]
        ar = fnn.Dense(1, use_bias=False, name='att_r')(x)[:, 0]
        out = self.propagate(coo, x=x, al=al, ar=ar,
                             edge_weight=edge_weight,
                             size=(n, n), edge_mask=edge_mask)
        return out + self.eps * x_0

    def message(self, x_j, al_j, ar_i, edge_weight=None):
        alpha = jnp.tanh(al_j + ar_i)
        if edge_weight is not None:
            alpha = alpha * edge_weight
        return alpha[:, None] * x_j


class AGNNConv(MessagePassing):
    """Attention over cosine similarity (reference ``agnn_conv.py``).
    Self-loops are (re-)added by default (reference ``:66-72``)."""
    requires_grad_beta: bool = True
    add_self_loops: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        if self.requires_grad_beta:
            beta = self.param('beta', fnn.initializers.ones, (1,))
        else:
            beta = jnp.ones((1,))
        coo = _coo(edge_index)
        if self.add_self_loops:
            # drop existing loops (zero their mask), then append fresh ones
            loop_free = coo[0] != coo[1]
            edge_mask = (loop_free if edge_mask is None
                         else edge_mask & loop_free)
            loops = jnp.arange(n, dtype=coo.dtype)
            coo = jnp.concatenate(
                [coo, jnp.stack([loops, loops])], axis=1)
            edge_mask = jnp.concatenate([edge_mask, jnp.ones((n,), bool)])
        xn = x * jax.lax.rsqrt(
            jnp.maximum((x * x).sum(-1, keepdims=True), 1e-24))
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        cos = (xn[src] * xn[dst]).sum(-1)
        alpha = self.edge_softmax(beta * cos, dst, n, edge_mask)
        return self.propagate(coo, x=x, alpha=alpha, size=(n, n),
                              edge_mask=edge_mask)

    def message(self, x_j, alpha):
        return alpha[:, None] * x_j


class ClusterGCNConv(MessagePassing):
    """Cluster-GCN conv: (A_hat + lambda*diag(A_hat)) X W
    (reference ``cluster_gcn_conv.py``)."""
    out_channels: int
    diag_lambda: float = 0.0
    add_self_loops: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ...utils.loop import add_self_loops as _asl
        n = x.shape[0]
        coo = _coo(edge_index)
        w = (jnp.ones((coo.shape[1],), x.dtype) if edge_mask is None
             else edge_mask.astype(x.dtype))
        if self.add_self_loops:
            # reference :100-102: remove existing loops, then add fresh
            w = jnp.where(coo[0] == coo[1], 0.0, w)
            coo, w = _asl(coo, w, num_nodes=n)
        dst = jnp.minimum(coo[1], n - 1)
        deg = scatter(w, dst, n, 'sum')
        deg_inv = 1.0 / jnp.maximum(deg, 1.0)
        ew = deg_inv[dst] * w
        diag = scatter(jnp.where(coo[0] == coo[1], ew, 0.0), dst, n, 'sum')
        out = self.propagate(coo, x=x, edge_weight=ew, size=(n, n))
        out = out + self.diag_lambda * diag[:, None] * x
        # reference cluster_gcn_conv.py:61-63: lin_out + root skip
        return (fnn.Dense(self.out_channels, use_bias=self.use_bias,
                          name='lin_out')(out)
                + fnn.Dense(self.out_channels, use_bias=False,
                            name='lin_root')(x))

    def message(self, x_j, edge_weight):
        return edge_weight[:, None] * x_j


class WLConvContinuous(MessagePassing):
    """1-WL continuous: x' = 0.5 * (x_i + mean_j w_ij x_j), where the
    mean is edge-weight-weighted (sum w x / sum w) when weights are
    given (reference ``wl_conv_continuous.py``)."""
    aggr: str = 'mean'

    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n_dst = x_dst.shape[0]
        if edge_weight is not None:
            coo = _coo(edge_index)
            src = jnp.minimum(coo[0], x_src.shape[0] - 1)
            dst = jnp.minimum(coo[1], n_dst - 1)
            w = edge_weight if edge_mask is None else jnp.where(
                edge_mask, edge_weight, 0.0)
            num = scatter(w[:, None] * x_src[src], dst, n_dst, 'sum',
                          mask=edge_mask)
            den = scatter(w, dst, n_dst, 'sum', mask=edge_mask)
            out = num / jnp.maximum(den, 1e-12)[:, None]
        else:
            out = self.propagate(edge_index, x=(x_src, x_dst),
                                 size=(x_src.shape[0], n_dst),
                                 edge_mask=edge_mask)
        return 0.5 * (x_dst + out)

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[:, None] * x_j


class LGConv(MessagePassing):
    """LightGCN conv: x' = sum_j 1/sqrt(didj) x_j (no self-loops, no
    weights; reference ``lg_conv.py``)."""
    normalize: bool = True

    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        if self.normalize:
            from .gcn_conv import gcn_norm
            coo, edge_weight = gcn_norm(_coo(edge_index), edge_weight, n,
                                        add_self_loops=False)
        else:
            coo = _coo(edge_index)
        return self.propagate(coo, x=x, edge_weight=edge_weight, size=(n, n),
                              edge_mask=edge_mask)

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[:, None] * x_j
