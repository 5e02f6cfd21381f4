"""DNAConv + PANConv.

Reference: ``nn/conv/dna_conv.py`` (just-jump attention over the stack
of all previous layer representations) and ``pan_conv.py`` (path
integral: MET matrix as weighted sum of adjacency powers).
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ...ops import scatter, softmax as segment_softmax


def restricted_softmax(src: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax with a phantom 0-logit (reference ``dna_conv.py:62``)."""
    src_max = jnp.maximum(src.max(axis=axis, keepdims=True), 0.0)
    out = jnp.exp(src - src_max)
    return out / (out.sum(axis=axis, keepdims=True) + jnp.exp(-src_max))


class _GroupedDense(fnn.Module):
    """Block-diagonal Linear (reference ``dna_conv.py:15`` Linear):
    weight [groups, in/g, out/g] applied per group."""
    out_channels: int
    groups: int = 1
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = x.shape[-1]
        g = self.groups
        w = self.param('weight', fnn.initializers.glorot_uniform(),
                       (g, f // g, self.out_channels // g))
        lead = x.shape[:-1]
        xg = x.reshape(lead + (g, f // g))
        out = jnp.einsum('...gi,gio->...go', xg, w)
        out = out.reshape(lead + (self.out_channels,))
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out


class DNAConv(MessagePassing):
    """Dynamic neighborhood aggregation (reference ``dna_conv.py:170``):
    x has shape [N, L, F] (all previous layer outputs); multi-head
    attention queries each node's latest layer against its neighbors'
    whole stacks, messages weighted by GCN-normalised edge weights and
    sum-aggregated."""
    channels: int
    heads: int = 1
    groups: int = 1
    normalize: bool = True
    add_self_loops: bool = True
    use_bias: bool = True
    aggr: str = 'add'

    @fnn.compact
    def __call__(self, x: jnp.ndarray, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from .gcn_conv import gcn_norm
        n, L, F = x.shape
        H = self.heads
        C = self.channels
        D = C // H
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        if self.normalize:
            coo, edge_weight = gcn_norm(coo, edge_weight, n,
                                        add_self_loops=self.add_self_loops)
            if edge_mask is not None and self.add_self_loops:
                edge_mask = jnp.concatenate([edge_mask,
                                             jnp.ones((n,), bool)])
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        q = _GroupedDense(C, self.groups, self.use_bias,
                          name='multi_head_lin_q')(x[:, -1])    # [N, C]
        k = _GroupedDense(C, self.groups, self.use_bias,
                          name='multi_head_lin_k')(x)           # [N, L, C]
        v = _GroupedDense(C, self.groups, self.use_bias,
                          name='multi_head_lin_v')(x)
        q = q.reshape(n, H, D)
        k = k.reshape(n, L, H, D)
        v = v.reshape(n, L, H, D)
        logits = jnp.einsum('ehd,elhd->elh', q[dst], k[src]) \
            / jnp.sqrt(float(D))                                # [E, L, H]
        alpha = restricted_softmax(logits, axis=1)
        msg = jnp.einsum('elh,elhd->ehd', alpha, v[src])        # [E, H, D]
        msg = msg.reshape(-1, C)
        if edge_weight is not None:
            msg = msg * edge_weight[:, None]
        return scatter(msg, dst, n, self._aggr(), mask=edge_mask)


class PANConv(MessagePassing):
    """Path-integral conv (reference ``pan_conv.py``): MET matrix
    M = sum_k (prod_{i<=k} w_i) A^k with LEARNED per-power weights
    (init 0.5), symmetrically normalised by the MET *rowcount* degree;
    out = lin(M_norm X). Returns ``(out, M_norm)`` like the reference.

    TPU note: M is materialised densely ([N, N] matmul powers on the
    MXU) — PAN is used on molecule-scale graphs where N^2 is tiny; the
    reference's sparse-coalesce rowcount is reproduced by counting
    structurally-nonzero entries."""
    out_channels: int
    filter_size: int = 3

    @fnn.compact
    def __call__(self, x: jnp.ndarray, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None):
        n = x.shape[0]
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        w = self.param('weight',
                       lambda k, s: jnp.full(s, 0.5),
                       (self.filter_size + 1,))
        val = jnp.ones((coo.shape[1],), x.dtype)
        if edge_mask is not None:
            val = jnp.where(edge_mask, val, 0.0)
        # adj_t: A[i, j] = edge j->i (reference builds the transposed A)
        A = jnp.zeros((n, n), x.dtype).at[dst, src].add(val)
        Ab = A > 0
        M = w[0] * jnp.eye(n, dtype=x.dtype)
        Mb = jnp.eye(n, dtype=bool)
        P = M
        Pb = Mb
        for k in range(1, self.filter_size + 1):
            P = (P @ A) * w[k]
            Pb = (Pb.astype(x.dtype) @ Ab.astype(x.dtype)) > 0
            M = M + P
            Mb = Mb | Pb
        deg = Mb.sum(1).astype(x.dtype)       # structural rowcount
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                        0.0)
        Mn = dis[:, None] * M * dis[None, :]
        out = fnn.Dense(self.out_channels, name='lin')(Mn @ x)
        return out, Mn
