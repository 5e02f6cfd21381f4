"""Dense differentiable pooling: DiffPool, MinCut, DMoN.

Reference: ``torch_geometric/nn/dense/{diff_pool,mincut_pool,dmon_pool}.py``.
These already operate on padded ``[B, N, F]`` / ``[B, N, N]`` tensors —
the natural TPU layout; each is a handful of batched matmuls.
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

EPS = 1e-15


def dense_diff_pool(x: jnp.ndarray, adj: jnp.ndarray, s: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    normalize: bool = True):
    """(x', adj', link_loss, ent_loss) (reference ``diff_pool.py:dense_diff_pool``)."""
    s = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        s = s * mask[..., None]
    out = jnp.swapaxes(s, 1, 2) @ x
    out_adj = jnp.swapaxes(s, 1, 2) @ adj @ s

    # global Frobenius norm over ALL entries (reference diff_pool.py
    # computes one norm over the whole [B, N, N] residual, / numel)
    link_loss = adj - s @ jnp.swapaxes(s, 1, 2)
    link_loss = jnp.sqrt(jnp.maximum((link_loss ** 2).sum(), 0))
    if normalize:
        link_loss = link_loss / jnp.asarray(adj.size, x.dtype)

    ent = (-s * jnp.log(s + EPS)).sum(-1)
    if mask is not None:
        ent = ent * mask
    ent_loss = ent.mean()
    return out, out_adj, link_loss, ent_loss


def dense_mincut_pool(x: jnp.ndarray, adj: jnp.ndarray, s: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None):
    """(x', adj', mincut_loss, ortho_loss) (reference ``mincut_pool.py``)."""
    s = jax.nn.softmax(s, axis=-1)
    if mask is not None:
        s = s * mask[..., None]
    k = s.shape[-1]
    st = jnp.swapaxes(s, 1, 2)
    out = st @ x
    out_adj = st @ adj @ s

    # MinCut numerator/denominator
    num = jnp.trace(out_adj, axis1=-2, axis2=-1)
    d = adj.sum(-1)
    d_mat = d[..., None] * s                     # D s
    den = jnp.trace(st @ d_mat, axis1=-2, axis2=-1)
    mincut_loss = (-(num / jnp.maximum(den, EPS))).mean()

    # Orthogonality
    ss = st @ s
    ss_n = ss / jnp.maximum(
        jnp.linalg.norm(ss, axis=(-2, -1), keepdims=True), EPS)
    i_n = jnp.eye(k, dtype=x.dtype) / jnp.sqrt(jnp.asarray(k, x.dtype))
    ortho_loss = jnp.linalg.norm(ss_n - i_n[None], axis=(-2, -1)).mean()

    # normalise pooled adjacency (zero diagonal, degree-normalised)
    eye = jnp.eye(k, dtype=x.dtype)
    out_adj = out_adj * (1 - eye)
    dd = out_adj.sum(-1)
    dis = jax.lax.rsqrt(jnp.maximum(dd, EPS))
    out_adj = dis[..., None] * out_adj * dis[..., None, :]
    return out, out_adj, mincut_loss, ortho_loss


def dense_dmon_pool(x: jnp.ndarray, adj: jnp.ndarray, s: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None):
    """(x', adj', spectral_loss, ortho_loss, cluster_loss)
    (reference ``dmon_pool.py``, Tsitsulin et al.). ``s`` are cluster
    probabilities (already softmaxed). Matches the reference exactly:
    masked x/s, selu on pooled features, masked-degree modularity,
    zeroed-diagonal degree-normalized coarse adjacency, and
    valid-node-count cluster-loss normalization."""
    B, N, k = s.shape
    m1 = (jnp.ones((B, N, 1), x.dtype) if mask is None
          else mask[..., None].astype(x.dtype))
    x = x * m1
    s = s * m1
    st = jnp.swapaxes(s, 1, 2)
    out = jax.nn.selu(st @ x)
    out_adj = st @ adj @ s

    degrees = adj.sum(-1)[..., None] * m1               # [B, N, 1]
    m = degrees.sum((1, 2)) / 2                         # [B]
    ca = st @ degrees                                   # [B, k, 1]
    cb = jnp.swapaxes(degrees, 1, 2) @ s                # [B, 1, k]
    normalizer = (ca @ cb) / 2 / m[:, None, None]
    decompose = out_adj - normalizer
    spectral_loss = (-jnp.trace(decompose, axis1=-2, axis2=-1)
                     / 2 / m).mean()

    ss = st @ s
    i_norm = jnp.sqrt(jnp.asarray(k, x.dtype))
    ss_n = ss / (jnp.linalg.norm(ss, axis=(-2, -1), keepdims=True))
    i_n = jnp.eye(k, dtype=x.dtype) / i_norm
    ortho_loss = jnp.linalg.norm(ss_n - i_n[None], axis=(-2, -1)).mean()

    cluster_size = s.sum(1)                             # [B, k]
    # reference dmon_pool.py:207: norm [B] / mask.sum [B,1] broadcasts
    # to [B, B] before the mean — replicated verbatim for parity
    cl = (jnp.linalg.norm(cluster_size, axis=-1)[None, :]
          / m1.sum((1, 2))[:, None])
    cluster_loss = (cl * i_norm - 1).mean()

    out_adj = out_adj * (1 - jnp.eye(k, dtype=x.dtype))
    d = jnp.sqrt(out_adj.sum(-1))[:, None] + EPS        # [B, 1, k]
    out_adj = out_adj / d / jnp.swapaxes(d, 1, 2)
    return out, out_adj, spectral_loss, ortho_loss, cluster_loss


class DMoNPooling(fnn.Module):
    """Learnable DMoN pooling module (reference ``dmon_pool.py:DMoNPooling``)."""
    k: int
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x, adj, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        s = fnn.Dense(self.k, name='mlp')(x)
        if self.dropout > 0 and not deterministic:
            s = fnn.Dropout(self.dropout, deterministic=False)(s)
        s = jax.nn.softmax(s, -1)
        out, out_adj, sp, on, cl = dense_dmon_pool(x, adj, s, mask)
        s_out = s if mask is None else s * mask[..., None]
        return s_out, out, out_adj, sp, on, cl
