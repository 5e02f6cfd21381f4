"""ViSNet — equivariant vector-scalar interactive GNN.

Reference: ``torch_geometric/nn/models/visnet.py`` (ViS_MP ``:456``,
ViSNetBlock ``:722``, EquivariantScalar ``:947``, ViSNet ``:1037``).

TPU design notes: the neighbor graph comes in as a static-shape
``(coo, edge_mask)`` pair (use ``nn.pool.radius_graph`` with a fixed
``max_num_neighbors``); all per-edge work is dense [E, ...] arithmetic
with masked segment-sums; per-layer attention is the per-edge SiLU-gated
dot product (no softmax — matches the reference), so everything lowers
to gathers + MXU matmuls. Forces come from ``jax.grad`` wrt positions
(the functional analog of the reference's ``derivative=True`` autograd
call).
"""

import math
from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np


def cosine_cutoff(d: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """(reference ``visnet.py:13``)."""
    c = 0.5 * (jnp.cos(d * math.pi / cutoff) + 1.0)
    return jnp.where(d < cutoff, c, 0.0)


def sphere_harmonics(vec: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Real spherical harmonics of unit vectors up to ``lmax``
    (reference ``Sphere._spherical_harmonics``, ``visnet.py:141``)."""
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    if lmax == 1:
        return jnp.stack([x, y, z], -1)
    s3 = math.sqrt(3.0)
    out = [x, y, z, s3 * x * z, s3 * x * y,
           y ** 2 - 0.5 * (x ** 2 + z ** 2), s3 * y * z,
           s3 / 2.0 * (z ** 2 - x ** 2)]
    return jnp.stack(out, -1)


class ExpNormalSmearing(fnn.Module):
    """(reference ``visnet.py:48``)."""
    cutoff: float = 5.0
    num_rbf: int = 32
    trainable: bool = False

    @fnn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        start = math.exp(-self.cutoff)
        means0 = np.linspace(start, 1.0, self.num_rbf).astype(np.float32)
        betas0 = np.full(self.num_rbf,
                         (2 / self.num_rbf * (1 - start)) ** -2, np.float32)
        if self.trainable:
            means = self.param('means', lambda k: jnp.asarray(means0))
            betas = self.param('betas', lambda k: jnp.asarray(betas0))
        else:
            means, betas = jnp.asarray(means0), jnp.asarray(betas0)
        d = dist[..., None]
        alpha = 5.0 / self.cutoff
        return cosine_cutoff(d, self.cutoff) * jnp.exp(
            -betas * (jnp.exp(-alpha * d) - means) ** 2)


class VecLayerNorm(fnn.Module):
    """Vector feature norm (reference ``visnet.py:185``): 'max_min' or
    'none' normalization of the L-component vectors, channelwise."""
    channels: int
    norm_type: Optional[str] = None
    trainable: bool = False

    @staticmethod
    def _max_min(vec: jnp.ndarray) -> jnp.ndarray:
        norm = jnp.linalg.norm(vec, axis=1)                  # [N, C]
        mx = norm.max(-1, keepdims=True)
        mn = norm.min(-1, keepdims=True)
        delta = mx - mn
        delta = jnp.where(delta == 0, 1.0, delta)
        scale = jax.nn.relu((norm - mn) / delta)
        unit = vec / jnp.maximum(norm, 1e-12)[:, None, :]
        return unit * scale[:, None, :]

    @fnn.compact
    def __call__(self, vec: jnp.ndarray) -> jnp.ndarray:
        if self.norm_type == 'max_min':
            if vec.shape[1] == 8:
                # lmax=2: normalize the l=1 (3) and l=2 (5) harmonic
                # blocks separately (reference visnet.py:255-264)
                vec = jnp.concatenate([self._max_min(vec[:, :3]),
                                       self._max_min(vec[:, 3:])], 1)
            else:
                vec = self._max_min(vec)
        if self.trainable:
            w = self.param('weight', fnn.initializers.ones,
                           (self.channels,))
            vec = vec * w
        return vec


class ViS_MP(fnn.Module):
    """Vector-scalar interactive message passing (reference ``:456``)."""
    num_heads: int
    hidden_channels: int
    cutoff: float
    vecnorm_type: Optional[str] = None
    trainable_vecnorm: bool = False
    last_layer: bool = False
    vertex: bool = False

    @fnn.compact
    def __call__(self, x, vec, coo, r_ij, f_ij, d_ij, edge_mask):
        H = self.num_heads
        D = self.hidden_channels // H
        C = self.hidden_channels
        n, e = x.shape[0], coo.shape[1]
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        valid = edge_mask & (coo[1] < n)

        x = fnn.LayerNorm(name='ln')(x)
        vec = VecLayerNorm(C, self.vecnorm_type, self.trainable_vecnorm,
                           name='vec_ln')(vec)

        q = fnn.Dense(C, name='q_proj')(x).reshape(n, H, D)
        k = fnn.Dense(C, name='k_proj')(x).reshape(n, H, D)
        v = fnn.Dense(C, name='v_proj')(x).reshape(n, H, D)
        dk = fnn.silu(fnn.Dense(C, name='dk_proj')(f_ij)).reshape(e, H, D)
        dv = fnn.silu(fnn.Dense(C, name='dv_proj')(f_ij)).reshape(e, H, D)

        vec1, vec2, vec3 = jnp.split(
            fnn.Dense(3 * C, use_bias=False, name='vec_proj')(vec), 3, -1)
        vec_dot = (vec1 * vec2).sum(1)                        # [N, C]

        # message (reference ViS_MP.message)
        attn = (q[dst] * k[src] * dk).sum(-1)                 # [E, H]
        attn = fnn.silu(attn) * cosine_cutoff(r_ij, self.cutoff)[:, None]
        v_j = (v[src] * dv * attn[..., None]).reshape(e, C)
        s1, s2 = jnp.split(fnn.silu(
            fnn.Dense(2 * C, name='s_proj')(v_j)), 2, -1)
        vec_j = vec[src] * s1[:, None, :] \
            + s2[:, None, :] * d_ij[:, :, None]               # [E, L, C]

        v_j = jnp.where(valid[:, None], v_j, 0)
        vec_j = jnp.where(valid[:, None, None], vec_j, 0)
        seg = jnp.where(valid, dst, n)
        x_agg = jax.ops.segment_sum(v_j, seg, n)
        vec_agg = jax.ops.segment_sum(vec_j, seg, n)

        o1, o2, o3 = jnp.split(fnn.Dense(3 * C, name='o_proj')(x_agg),
                               3, -1)
        dx = vec_dot * o2 + o3
        dvec = vec3 * o1[:, None, :] + vec_agg
        if self.last_layer:
            return dx, dvec, None

        # edge update (reference ViS_MP.edge_update)
        def rejection(w, d):
            proj = (w * d[:, :, None]).sum(1, keepdims=True)
            return w - proj * d[:, :, None]

        w1 = rejection(fnn.Dense(C, use_bias=False, name='w_trg')(
            vec[dst]), d_ij)
        w2 = rejection(fnn.Dense(C, use_bias=False, name='w_src')(
            vec[src]), -d_ij)
        w_dot = (w1 * w2).sum(1)
        if self.vertex:
            # ViS_MP_Vertex (reference ``:657``): both t-rejections act
            # on vec_i (the target), and f_proj gates w_dot / t_dot
            # with separate halves.
            t1 = rejection(fnn.Dense(C, use_bias=False, name='t_trg')(
                vec[dst]), d_ij)
            t2 = rejection(fnn.Dense(C, use_bias=False, name='t_src')(
                vec[dst]), -d_ij)
            t_dot = (t1 * t2).sum(1)
            f1, f2 = jnp.split(fnn.silu(
                fnn.Dense(2 * C, name='f_proj')(f_ij)), 2, -1)
            df = f1 * w_dot + f2 * t_dot
        else:
            df = fnn.silu(fnn.Dense(C, name='f_proj')(f_ij)) * w_dot
        df = jnp.where(valid[:, None], df, 0)
        return dx, dvec, df


class GatedEquivariantBlock(fnn.Module):
    """(reference ``visnet.py:874``)."""
    hidden_channels: int
    out_channels: int
    scalar_activation: bool = False

    @fnn.compact
    def __call__(self, x, v):
        o = self.out_channels
        vec1 = jnp.linalg.norm(
            fnn.Dense(self.hidden_channels, use_bias=False,
                      name='vec1')(v), axis=-2)
        vec2 = fnn.Dense(o, use_bias=False, name='vec2')(v)
        h = jnp.concatenate([x, vec1], -1)
        h = fnn.Dense(self.hidden_channels, name='up1')(h)
        h = fnn.silu(h)
        h = fnn.Dense(2 * o, name='up2')(h)
        x, gate = jnp.split(h, 2, -1)
        v = gate[:, None, :] * vec2
        if self.scalar_activation:
            x = fnn.silu(x)
        return x, v


class EquivariantScalar(fnn.Module):
    """(reference ``visnet.py:947``)."""
    hidden_channels: int

    @fnn.compact
    def __call__(self, x, v):
        x, v = GatedEquivariantBlock(self.hidden_channels,
                                     self.hidden_channels // 2,
                                     scalar_activation=True,
                                     name='blk1')(x, v)
        x, v = GatedEquivariantBlock(self.hidden_channels // 2, 1,
                                     name='blk2')(x, v)
        return x + v.sum() * 0


class ViSNetBlock(fnn.Module):
    """Representation module (reference ``visnet.py:722``)."""
    lmax: int = 1
    vecnorm_type: Optional[str] = None
    trainable_vecnorm: bool = False
    num_heads: int = 8
    num_layers: int = 4
    hidden_channels: int = 128
    num_rbf: int = 32
    trainable_rbf: bool = False
    max_z: int = 100
    cutoff: float = 5.0
    vertex: bool = False

    @fnn.compact
    def __call__(self, z, pos, coo, edge_mask):
        C = self.hidden_channels
        n, e = z.shape[0], coo.shape[1]
        L = (self.lmax + 1) ** 2 - 1
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        valid = edge_mask & (coo[1] < n)

        x = fnn.Embed(self.max_z, C, name='embedding')(z)
        edge_vec = pos[src] - pos[dst]
        r_ij = jnp.maximum(jnp.linalg.norm(edge_vec, axis=-1), 1e-8)
        f_ij = ExpNormalSmearing(self.cutoff, self.num_rbf,
                                 self.trainable_rbf, name='rbf')(r_ij)
        is_loop = src == dst
        unit = jnp.where(is_loop[:, None], edge_vec,
                         edge_vec / r_ij[:, None])
        d_ij = sphere_harmonics(unit, self.lmax)              # [E, L]

        # neighbor embedding (reference NeighborEmbedding, ``:340``)
        nb_valid = valid & ~is_loop
        Cw = cosine_cutoff(r_ij, self.cutoff)
        W = fnn.Dense(C, name='distance_proj')(f_ij) * Cw[:, None]
        xn = fnn.Embed(self.max_z, C, name='nbr_embedding')(z)
        msg = jnp.where(nb_valid[:, None], xn[src] * W, 0)
        agg = jax.ops.segment_sum(msg, jnp.where(nb_valid, dst, n), n)
        x = fnn.Dense(C, name='combine')(jnp.concatenate([x, agg], -1))

        vec = jnp.zeros((n, L, C), x.dtype)
        f = (x[dst] + x[src]) * fnn.Dense(C, name='edge_proj')(f_ij)

        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            dx, dvec, df = ViS_MP(self.num_heads, C, self.cutoff,
                                  self.vecnorm_type, self.trainable_vecnorm,
                                  last_layer=last, vertex=self.vertex,
                                  name=f'vis_mp_{i}')(
                x, vec, coo, r_ij, f, d_ij, valid)
            x = x + dx
            vec = vec + dvec
            if df is not None:
                f = f + df

        x = fnn.LayerNorm(name='out_norm')(x)
        vec = VecLayerNorm(C, self.vecnorm_type, self.trainable_vecnorm,
                           name='vec_out_norm')(vec)
        return x, vec


class ViSNet(fnn.Module):
    """Full model (reference ``visnet.py:1037``): per-graph scalar
    prediction. For forces, differentiate wrt ``pos``:

        energy_fn = lambda pos: model.apply(params, z, pos, ...)[graph]
        forces = -jax.grad(energy_fn)(pos)
    """
    lmax: int = 1
    vecnorm_type: Optional[str] = None
    trainable_vecnorm: bool = False
    num_heads: int = 8
    num_layers: int = 4
    hidden_channels: int = 128
    num_rbf: int = 32
    trainable_rbf: bool = False
    cutoff: float = 5.0
    max_z: int = 100
    reduce_op: str = 'sum'
    mean: float = 0.0
    std: float = 1.0
    vertex: bool = False

    @fnn.compact
    def __call__(self, z, pos, coo, edge_mask=None, batch=None,
                 batch_size: int = 1, node_mask=None):
        n = z.shape[0]
        if edge_mask is None:
            edge_mask = jnp.ones((coo.shape[1],), bool)
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        x, v = ViSNetBlock(lmax=self.lmax, vecnorm_type=self.vecnorm_type,
                           trainable_vecnorm=self.trainable_vecnorm,
                           num_heads=self.num_heads,
                           num_layers=self.num_layers,
                           hidden_channels=self.hidden_channels,
                           num_rbf=self.num_rbf,
                           trainable_rbf=self.trainable_rbf,
                           cutoff=self.cutoff,
                           max_z=self.max_z, vertex=self.vertex,
                           name='representation')(z, pos, coo, edge_mask)
        x = EquivariantScalar(self.hidden_channels, name='output')(x, v)
        x = x * self.std
        if node_mask is not None:
            x = jnp.where(node_mask[:, None], x, 0)
        y = jax.ops.segment_sum(x, jnp.minimum(batch, batch_size - 1),
                                batch_size)
        if self.reduce_op == 'mean':
            cnt = jax.ops.segment_sum(jnp.ones_like(batch, jnp.float32),
                                      jnp.minimum(batch, batch_size - 1),
                                      batch_size)
            y = y / jnp.maximum(cnt, 1)[:, None]
        return y + self.mean
