"""SignedConv, DirGNNConv, AntiSymmetricConv, HypergraphConv, WLConv, DNAConv.

Reference files: ``nn/conv/signed_conv.py``, ``dir_gnn_conv.py``,
``antisymmetric_conv.py``, ``hypergraph_conv.py``, ``wl_conv.py``,
``dna_conv.py``.
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ..message_passing import MessagePassing
from ...ops import scatter, softmax as segment_softmax


class SignedConv(MessagePassing):
    """Signed GCN conv over positive/negative edge sets
    (reference ``signed_conv.py``)."""
    out_channels: int
    first_aggr: bool = True

    @fnn.compact
    def __call__(self, x, pos_edge_index, neg_edge_index,
                 pos_mask: Optional[jnp.ndarray] = None,
                 neg_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0] if not isinstance(x, tuple) else x[0].shape[0]
        if self.first_aggr:
            pos = self.propagate(pos_edge_index, x=x, size=(n, n),
                                 edge_mask=pos_mask)
            neg = self.propagate(neg_edge_index, x=x, size=(n, n),
                                 edge_mask=neg_mask)
            out_pos = fnn.Dense(self.out_channels, name='lin_pos')(
                jnp.concatenate([pos, x], -1))
            out_neg = fnn.Dense(self.out_channels, name='lin_neg')(
                jnp.concatenate([neg, x], -1))
            return jnp.concatenate([out_pos, out_neg], -1)
        # deeper layers: x = [x_pos | x_neg]
        f = x.shape[-1] // 2
        x_pos, x_neg = x[:, :f], x[:, f:]
        pos_pos = self.propagate(pos_edge_index, x=x_pos, size=(n, n),
                                 edge_mask=pos_mask)
        pos_neg = self.propagate(neg_edge_index, x=x_pos, size=(n, n),
                                 edge_mask=neg_mask)
        neg_pos = self.propagate(pos_edge_index, x=x_neg, size=(n, n),
                                 edge_mask=pos_mask)
        neg_neg = self.propagate(neg_edge_index, x=x_neg, size=(n, n),
                                 edge_mask=neg_mask)
        out_pos = fnn.Dense(self.out_channels, name='lin_pos')(
            jnp.concatenate([pos_pos, neg_neg, x_pos], -1))
        out_neg = fnn.Dense(self.out_channels, name='lin_neg')(
            jnp.concatenate([pos_neg, neg_pos, x_neg], -1))
        return jnp.concatenate([out_pos, out_neg], -1)

    aggr: str = 'mean'


class DirGNNConv(fnn.Module):
    """Directional wrapper: alpha * conv(in-edges) + (1-alpha) *
    conv(out-edges) (reference ``dir_gnn_conv.py``)."""
    conv: MessagePassing
    alpha: float = 0.5
    root_weight: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, **kwargs) -> jnp.ndarray:
        import dataclasses
        from ...edge_index import EdgeIndex
        coo = edge_index.coo if isinstance(edge_index, EdgeIndex) \
            else edge_index
        # Two independent copies of the wrapped conv (fresh inline modules;
        # clone() would stay unbound in flax).
        fields = {f.name: getattr(self.conv, f.name)
                  for f in dataclasses.fields(type(self.conv))
                  if f.name not in ('parent', 'name')}
        conv_in = type(self.conv)(**fields, name='conv_in')
        conv_out = type(self.conv)(**fields, name='conv_out')
        out_in = conv_in(x, coo, **kwargs)
        out_out = conv_out(x, coo[::-1], **kwargs)
        out = self.alpha * out_in + (1 - self.alpha) * out_out
        if self.root_weight:
            out = out + fnn.Dense(out.shape[-1], name='lin')(x)
        return out


class AntiSymmetricConv(fnn.Module):
    """Anti-symmetric ODE conv (reference ``antisymmetric_conv.py``):
    x <- x + eps * tanh((W - W^T - gamma I) x + Phi(x, A) + b), iterated."""
    phi: MessagePassing
    num_iters: int = 1
    epsilon: float = 0.1
    gamma: float = 0.1

    @fnn.compact
    def __call__(self, x, edge_index, **kwargs) -> jnp.ndarray:
        f = x.shape[-1]
        W = self.param('weight', fnn.initializers.glorot_uniform(), (f, f))
        b = self.param('bias', fnn.initializers.zeros, (f,))
        A = W - W.T - self.gamma * jnp.eye(f, dtype=x.dtype)
        for _ in range(self.num_iters):
            h = self.phi(x, edge_index, **kwargs)
            x = x + self.epsilon * jnp.tanh(x @ A + h + b)
        return x


class HypergraphConv(MessagePassing):
    """Hypergraph conv (reference ``hypergraph_conv.py``):
    X' = D^-1 H W B^-1 H^T X Theta, given incidence pairs
    ``hyperedge_index`` [2, nnz] (node, hyperedge)."""
    out_channels: int
    use_attention: bool = False
    heads: int = 1
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, hyperedge_index,
                 hyperedge_weight: Optional[jnp.ndarray] = None,
                 num_edges: Optional[int] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n = x.shape[0]
        coo = hyperedge_index.coo if hasattr(hyperedge_index, 'coo') \
            else hyperedge_index
        m = num_edges if num_edges is not None else n
        node, edge = (jnp.minimum(coo[0], n - 1),
                      jnp.minimum(coo[1], m - 1))
        x = fnn.Dense(self.out_channels, use_bias=False, name='lin')(x)
        w = (jnp.ones((m,), x.dtype) if hyperedge_weight is None
             else hyperedge_weight)
        # D_ii = sum of w over incident hyperedges; B_ee = edge degree
        deg = scatter(w[edge], node, n, 'sum', mask=mask)
        edeg = scatter(jnp.ones_like(edge, x.dtype), edge, m, 'sum',
                       mask=mask)
        dinv = 1.0 / jnp.maximum(deg, 1.0)
        binv = 1.0 / jnp.maximum(edeg, 1.0)
        # edge features: B^-1 H^T X
        he = scatter(x[node] * binv[edge][:, None], edge, m, 'sum',
                     mask=mask)
        # back to nodes: D^-1 H W he
        msg = he[edge] * (w[edge] * dinv[node])[:, None]
        out = scatter(msg, node, n, 'sum', mask=mask)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out


class WLConv:
    """Weisfeiler-Lehman color refinement (reference ``wl_conv.py``).

    Host-side (hashing is inherently dynamic): call with numpy arrays.
    Maintains a color dictionary across calls like the reference module.
    """

    def __init__(self):
        self.hashmap = {}

    def __call__(self, x: np.ndarray, edge_index) -> np.ndarray:
        coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                         else edge_index)
        x = np.asarray(x)
        if x.ndim > 1:  # one-hot -> categorical
            x = x.argmax(-1)
        n = x.shape[0]
        adj = [[] for _ in range(n)]
        for s, d in zip(coo[0], coo[1]):
            if d < n and s < n:
                adj[int(d)].append(int(x[s]))
        out = np.empty(n, np.int64)
        for v in range(n):
            key = (int(x[v]), tuple(sorted(adj[v])))
            if key not in self.hashmap:
                self.hashmap[key] = len(self.hashmap)
            out[v] = self.hashmap[key]
        return out

    def histogram(self, x: np.ndarray, batch: Optional[np.ndarray] = None,
                  norm: bool = False) -> np.ndarray:
        num_colors = len(self.hashmap)
        if batch is None:
            batch = np.zeros(len(x), np.int64)
        b = int(batch.max()) + 1
        hist = np.zeros((b, num_colors), np.float32)
        for c, g in zip(np.asarray(x), batch):
            hist[int(g), int(c)] += 1
        if norm:
            hist /= np.maximum(np.linalg.norm(hist, axis=-1,
                                              keepdims=True), 1e-12)
        return hist


class MeshCNNConv(fnn.Module):
    """MeshCNN edge convolution (reference ``nn/conv/meshcnn_conv.py:13``):

        x'_i = W0 x_i + W1 |a-c| + W2 (a+c) + W3 |b-d| + W4 (b+d)

    over the 4 ring neighbors (a, b upper face; c, d lower face) of each
    mesh edge. TPU design: neighbors come as a dense ``ring [E, 4]``
    index array (the reference's ``[2, 4|E|]`` adjacency in fixed a/b/c/d
    column order reshapes to this) so the stencil is 4 aligned gathers +
    5 MXU matmuls — no message-passing scatter at all.
    """
    out_channels: int
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x: jnp.ndarray, ring: jnp.ndarray) -> jnp.ndarray:
        e = x.shape[0]
        if ring.ndim == 2 and ring.shape[0] == 2:   # [2, 4E] PyG layout
            ring = ring[1].reshape(e, 4)
        safe = jnp.minimum(ring, e - 1)
        a, b, c, d = (x[safe[:, k]] for k in range(4))
        feats = [x, jnp.abs(a - c), a + c, jnp.abs(b - d), b + d]
        out = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                        name='w0')(feats[0])
        for k in range(1, 5):
            out = out + fnn.Dense(self.out_channels, use_bias=False,
                                  name=f'w{k}')(feats[k])
        return out
