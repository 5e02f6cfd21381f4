"""DimeNet and DimeNet++ — directional message passing.

Full re-implementation of the reference
(``torch_geometric/nn/models/dimenet.py:457,728``): spherical-Bessel x
zonal-harmonic bases, embedding/interaction/output blocks with residual
towers, and edge->edge triplet message passing.

TPU-native design choices:
  * Triplet index sets are precomputed on the host with one vectorized
    numpy pass and padded to a static ``max_triplets`` (the reference
    derives them per-forward from a SparseTensor,
    ``dimenet.py:426-455``); the device never sees dynamic shapes.
  * The basis functions are evaluated with jnp recurrences (spherical
    Bessel upward recurrence, Legendre three-term recurrence) instead of
    sympy-lambdified formulas — same math, jit-friendly, no symbolic
    dependency at runtime. Bessel zeros/normalizers are tiny host
    constants (scipy, cached).
  * All scatter reductions run over static segment counts so XLA lowers
    them to deterministic sorted segment-sums.
"""

import math
from functools import lru_cache
from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import scatter


# -- host-side basis constants (reference dimenet_utils.py:11-27) ---------

@lru_cache(maxsize=None)
def _bessel_zeros_and_norms(num_spherical: int, num_radial: int):
    """First ``num_radial`` zeros of j_l for l < num_spherical and the
    normalizers 1/sqrt(0.5*J_{l+1}(z)^2)."""
    from scipy import special as sp
    from scipy.optimize import brentq

    def Jn(r, n):
        return np.sqrt(np.pi / (2 * r)) * sp.jv(n + 0.5, r)

    n, k = num_spherical, num_radial
    zerosj = np.zeros((n, k), dtype='float64')
    zerosj[0] = np.arange(1, k + 1) * np.pi
    points = np.arange(1, k + n) * np.pi
    racines = np.zeros(k + n - 1, dtype='float64')
    for i in range(1, n):
        for j in range(k + n - 1 - i):
            racines[j] = brentq(Jn, points[j], points[j + 1], (i,))
        points = racines.copy()
        zerosj[i][:k] = racines[:k]
    norms = np.zeros((n, k))
    for l in range(n):
        norms[l] = 1.0 / np.sqrt(0.5 * Jn(zerosj[l], l + 1) ** 2)
    return zerosj.astype(np.float32), norms.astype(np.float32)


def _spherical_jn(x: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """j_l(x) for l in [0, lmax] stacked on the last axis.

    Upward recurrence for x >= 0.5; for x < 0.5 the recurrence
    cancels catastrophically in f32 (error ~ x^-l), so the two-term
    ascending series x^l/(2l+1)!! (1 - x^2/(2(2l+3))) is used there
    (relative error < 1e-4 at the switch point)."""
    xs = jnp.maximum(x, 0.5)          # recurrence branch input only
    j0 = jnp.sin(xs) / xs
    rec = [j0]
    if lmax >= 1:
        j1 = jnp.sin(xs) / xs ** 2 - jnp.cos(xs) / xs
        rec.append(j1)
        for l in range(1, lmax):
            rec.append((2 * l + 1) / xs * rec[l] - rec[l - 1])
    small = x < 0.5
    out = []
    dfact = 1.0
    for l in range(lmax + 1):
        if l > 0:
            dfact *= (2 * l + 1)
        series = x ** l / dfact * (1 - x * x / (2 * (2 * l + 3)))
        out.append(jnp.where(small, series, rec[l] if lmax >= 1
                             else rec[0]))
    return jnp.stack(out, axis=-1)


def _zonal_harmonics(angle: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Y_l^0(theta) = sqrt((2l+1)/4pi) P_l(cos theta) for l in [0, lmax]
    stacked on the last axis (Legendre three-term recurrence)."""
    z = jnp.cos(angle)
    p = [jnp.ones_like(z)]
    if lmax >= 1:
        p.append(z)
        for l in range(2, lmax + 1):
            p.append(((2 * l - 1) * z * p[l - 1] - (l - 1) * p[l - 2])
                     / l)
    pref = jnp.asarray([math.sqrt((2 * l + 1) / (4 * math.pi))
                        for l in range(lmax + 1)], z.dtype)
    return jnp.stack(p, axis=-1) * pref


class Envelope(fnn.Module):
    """(reference ``dimenet.py:35``) u(x) = 1/x + a x^(p-1) + b x^p +
    c x^(p+1), zero past the cutoff."""
    exponent: int = 5

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.exponent + 1
        a = -(p + 1) * (p + 2) / 2
        b = p * (p + 2)
        c = -p * (p + 1) / 2
        xp0 = x ** (p - 1)
        xs = jnp.maximum(x, 1e-12)
        env = 1.0 / xs + a * xp0 + b * xp0 * x + c * xp0 * x * x
        return jnp.where(x < 1.0, env, 0.0)


class BesselBasisLayer(fnn.Module):
    """(reference ``dimenet.py:52``) learnable-frequency radial basis."""
    num_radial: int
    cutoff: float = 5.0
    envelope_exponent: int = 5

    @fnn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        freq = self.param(
            'freq', lambda key, s: jnp.arange(1, s[0] + 1,
                                              dtype=jnp.float32) * jnp.pi,
            (self.num_radial,))
        d = (dist / self.cutoff)[:, None]
        env = Envelope(self.envelope_exponent)(d)
        return env * jnp.sin(freq[None] * d)


class SphericalBasisLayer(fnn.Module):
    """(reference ``dimenet.py:73``) j_l(z_ln d/c) x Y_l0(angle) outer
    basis over triplets."""
    num_spherical: int
    num_radial: int
    cutoff: float = 5.0
    envelope_exponent: int = 5

    @fnn.compact
    def __call__(self, dist: jnp.ndarray, angle: jnp.ndarray,
                 idx_kj: jnp.ndarray) -> jnp.ndarray:
        n, k = self.num_spherical, self.num_radial
        zeros, norms = _bessel_zeros_and_norms(n, k)
        u = dist / self.cutoff                              # [E]
        # rbf[e, l, n] = norm * j_l(z_ln * u_e)
        x = u[:, None, None] * jnp.asarray(zeros)[None]     # [E, L, K]
        jl = _spherical_jn(x, n - 1)                        # [E, L, K, L+1]
        l_idx = jnp.arange(n)
        rbf = jnp.take_along_axis(
            jl, l_idx[None, :, None, None].repeat(k, 2), axis=-1)[..., 0]
        rbf = rbf * jnp.asarray(norms)[None]
        env = Envelope(self.envelope_exponent)(u)[:, None, None]
        rbf = env * rbf                                     # [E, L, K]
        cbf = _zonal_harmonics(angle, n - 1)                # [T, L]
        e = dist.shape[0]
        kj = jnp.minimum(idx_kj, e - 1)
        out = rbf[kj] * cbf[:, :, None]                     # [T, L, K]
        return out.reshape(-1, n * k)


class EmbeddingBlock(fnn.Module):
    """(reference ``dimenet.py:129``)."""
    num_radial: int
    hidden_channels: int

    @fnn.compact
    def __call__(self, z, rbf, i, j):
        emb = self.param(
            'emb', lambda key, s: jax.random.uniform(
                key, s, jnp.float32, -jnp.sqrt(3.0), jnp.sqrt(3.0)),
            (95, self.hidden_channels))
        x = emb[jnp.clip(z, 0, 94)]
        rbf = fnn.silu(fnn.Dense(self.hidden_channels,
                                 name='lin_rbf')(rbf))
        h = jnp.concatenate([x[i], x[j], rbf], axis=-1)
        return fnn.silu(fnn.Dense(self.hidden_channels, name='lin')(h))


class ResidualLayer(fnn.Module):
    """(reference ``dimenet.py:151``)."""
    hidden_channels: int

    @fnn.compact
    def __call__(self, x):
        h = fnn.silu(fnn.Dense(self.hidden_channels, name='lin1')(x))
        return x + fnn.silu(fnn.Dense(self.hidden_channels,
                                      name='lin2')(h))


class InteractionBlock(fnn.Module):
    """(reference ``dimenet.py:170``) bilinear directional interaction."""
    hidden_channels: int
    num_bilinear: int
    num_spherical: int
    num_radial: int
    num_before_skip: int = 1
    num_after_skip: int = 2

    @fnn.compact
    def __call__(self, x, rbf, sbf, idx_kj, idx_ji, triplet_mask):
        H = self.hidden_channels
        e = x.shape[0]
        rbf = fnn.Dense(H, use_bias=False, name='lin_rbf')(rbf)
        sbf = fnn.Dense(self.num_bilinear, use_bias=False,
                        name='lin_sbf')(sbf)
        x_ji = fnn.silu(fnn.Dense(H, name='lin_ji')(x))
        x_kj = fnn.silu(fnn.Dense(H, name='lin_kj')(x))
        x_kj = x_kj * rbf
        W = self.param('W', fnn.initializers.normal(2.0 / H),
                       (H, self.num_bilinear, H))
        kj = jnp.minimum(idx_kj, e - 1)
        # reference dimenet.py:230: einsum('wj,wl,ijl->wi', sbf, x_kj, W)
        t = jnp.einsum('wj,wl,ijl->wi', sbf, x_kj[kj], W)
        t = jnp.where(triplet_mask[:, None], t, 0)
        x_kj = scatter(t, jnp.minimum(idx_ji, e - 1), e, 'sum',
                       mask=triplet_mask)
        h = x_ji + x_kj
        for b in range(self.num_before_skip):
            h = ResidualLayer(H, name=f'res_before_{b}')(h)
        h = fnn.silu(fnn.Dense(H, name='lin')(h)) + x
        for b in range(self.num_after_skip):
            h = ResidualLayer(H, name=f'res_after_{b}')(h)
        return h


class InteractionPPBlock(fnn.Module):
    """(reference ``dimenet.py:241``) basis-bottlenecked interaction."""
    hidden_channels: int
    int_emb_size: int
    basis_emb_size: int
    num_spherical: int
    num_radial: int
    num_before_skip: int = 1
    num_after_skip: int = 2

    @fnn.compact
    def __call__(self, x, rbf, sbf, idx_kj, idx_ji, triplet_mask):
        H = self.hidden_channels
        e = x.shape[0]
        x_ji = fnn.silu(fnn.Dense(H, name='lin_ji')(x))
        x_kj = fnn.silu(fnn.Dense(H, name='lin_kj')(x))
        rbf = fnn.Dense(self.basis_emb_size, use_bias=False,
                        name='lin_rbf1')(rbf)
        rbf = fnn.Dense(H, use_bias=False, name='lin_rbf2')(rbf)
        x_kj = x_kj * rbf
        x_kj = fnn.silu(fnn.Dense(self.int_emb_size, use_bias=False,
                                  name='lin_down')(x_kj))
        sbf = fnn.Dense(self.basis_emb_size, use_bias=False,
                        name='lin_sbf1')(sbf)
        sbf = fnn.Dense(self.int_emb_size, use_bias=False,
                        name='lin_sbf2')(sbf)
        kj = jnp.minimum(idx_kj, e - 1)
        t = x_kj[kj] * sbf
        t = jnp.where(triplet_mask[:, None], t, 0)
        x_kj = scatter(t, jnp.minimum(idx_ji, e - 1), e, 'sum',
                       mask=triplet_mask)
        x_kj = fnn.silu(fnn.Dense(H, use_bias=False, name='lin_up')(x_kj))
        h = x_ji + x_kj
        for b in range(self.num_before_skip):
            h = ResidualLayer(H, name=f'res_before_{b}')(h)
        h = fnn.silu(fnn.Dense(H, name='lin')(h)) + x
        for b in range(self.num_after_skip):
            h = ResidualLayer(H, name=f'res_after_{b}')(h)
        return h


class OutputBlock(fnn.Module):
    """(reference ``dimenet.py:337``)."""
    num_radial: int
    hidden_channels: int
    out_channels: int
    num_layers: int = 3
    output_initializer: str = 'zeros'

    @fnn.compact
    def __call__(self, x, rbf, i, num_nodes, edge_mask):
        h = fnn.Dense(self.hidden_channels, use_bias=False,
                      name='lin_rbf')(rbf) * x
        h = scatter(h, jnp.minimum(i, num_nodes - 1), num_nodes, 'sum',
                    mask=edge_mask)
        for l in range(self.num_layers):
            h = fnn.silu(fnn.Dense(self.hidden_channels,
                                   name=f'lins_{l}')(h))
        init = (fnn.initializers.zeros
                if self.output_initializer == 'zeros'
                else fnn.initializers.glorot_uniform())
        return fnn.Dense(self.out_channels, use_bias=False,
                         kernel_init=init, name='lin')(h)


class OutputPPBlock(fnn.Module):
    """(reference ``dimenet.py:381``)."""
    num_radial: int
    hidden_channels: int
    out_emb_channels: int
    out_channels: int
    num_layers: int = 3
    output_initializer: str = 'zeros'

    @fnn.compact
    def __call__(self, x, rbf, i, num_nodes, edge_mask):
        h = fnn.Dense(self.hidden_channels, use_bias=False,
                      name='lin_rbf')(rbf) * x
        h = scatter(h, jnp.minimum(i, num_nodes - 1), num_nodes, 'sum',
                    mask=edge_mask)
        h = fnn.Dense(self.out_emb_channels, use_bias=False,
                      name='lin_up')(h)
        for l in range(self.num_layers):
            h = fnn.silu(fnn.Dense(self.out_emb_channels,
                                   name=f'lins_{l}')(h))
        init = (fnn.initializers.zeros
                if self.output_initializer == 'zeros'
                else fnn.initializers.glorot_uniform())
        return fnn.Dense(self.out_channels, use_bias=False,
                         kernel_init=init, name='lin')(h)


def triplets(coo: np.ndarray, num_nodes: int,
             max_triplets: Optional[int] = None
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host: (k->j, j->i) triplet edge pairs, vectorized
    (reference ``dimenet.py:426-455``). ``coo`` rows are (j, i) per the
    reference's ``row, col = edge_index`` with edges j->i. Returns
    (idx_kj, idx_ji, mask) padded to ``max_triplets``."""
    row, col = np.asarray(coo[0]), np.asarray(coo[1])
    e = row.shape[0]
    order = np.argsort(col, kind='stable')       # edges grouped by dst
    col_s = col[order]
    indptr = np.searchsorted(col_s, np.arange(num_nodes + 1))
    # for edge e=(j->i): all edges f=(k->j) with dst j
    cnt = indptr[row + 1] - indptr[row]
    idx_ji = np.repeat(np.arange(e), cnt)
    starts = np.repeat(indptr[row], cnt)
    local = np.arange(cnt.sum()) - np.repeat(
        np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
    idx_kj = order[starts + local]
    keep = row[idx_kj] != col[idx_ji]            # drop k == i
    idx_kj, idx_ji = idx_kj[keep], idx_ji[keep]
    t = idx_kj.shape[0]
    cap = max_triplets or t
    out_kj = np.full(cap, e, np.int32)
    out_ji = np.full(cap, e, np.int32)
    out_kj[:min(t, cap)] = idx_kj[:cap]
    out_ji[:min(t, cap)] = idx_ji[:cap]
    return out_kj, out_ji, np.arange(cap) < min(t, cap)


class DimeNet(fnn.Module):
    """(reference ``dimenet.py:457``). Pass ``coo`` (j->i edges),
    triplet indices from :func:`triplets`, and optional masks — the
    interaction graph and triplets are host-precomputed for static
    shapes; use :meth:`prepare` for the full pipeline."""
    hidden_channels: int = 128
    out_channels: int = 1
    num_blocks: int = 6
    num_bilinear: int = 8
    num_spherical: int = 7
    num_radial: int = 6
    cutoff: float = 5.0
    max_num_neighbors: int = 32
    envelope_exponent: int = 5
    num_before_skip: int = 1
    num_after_skip: int = 2
    num_output_layers: int = 3
    output_initializer: str = 'zeros'

    _pp: bool = False

    triplets = staticmethod(triplets)

    @classmethod
    def prepare(cls, pos: np.ndarray, batch: Optional[np.ndarray],
                cutoff: float, max_num_neighbors: int = 32,
                max_triplets: Optional[int] = None):
        """Host: radius graph (j->i both directions) + triplets."""
        d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        same = (np.ones_like(d, bool) if batch is None
                else batch[:, None] == batch[None])
        keep = (d <= cutoff) & same & ~np.eye(len(pos), dtype=bool)
        i, j = np.nonzero(keep)
        coo = np.stack([j, i]).astype(np.int32)   # j->i
        kj, ji, mask = triplets(coo, len(pos), max_triplets)
        return coo, kj, ji, mask

    def _interaction(self, b):
        return InteractionBlock(
            self.hidden_channels, self.num_bilinear, self.num_spherical,
            self.num_radial, self.num_before_skip, self.num_after_skip,
            name=f'interaction_{b}')

    def _output(self, b):
        return OutputBlock(
            self.num_radial, self.hidden_channels, self.out_channels,
            self.num_output_layers, self.output_initializer,
            name=f'output_{b}')

    @fnn.compact
    def __call__(self, z, pos, coo, idx_kj, idx_ji, triplet_mask,
                 batch=None, batch_size: int = 1,
                 edge_mask: Optional[jnp.ndarray] = None):
        n = z.shape[0]
        e = coo.shape[1]
        j = jnp.minimum(coo[0], n - 1)
        i = jnp.minimum(coo[1], n - 1)
        dist = jnp.sqrt(jnp.maximum(
            ((pos[i] - pos[j]) ** 2).sum(-1), 1e-12))
        kj = jnp.minimum(idx_kj, e - 1)
        ji = jnp.minimum(idx_ji, e - 1)
        idx_i = i[ji]
        idx_j = j[ji]
        idx_k = j[kj]
        if self._pp:
            v1 = pos[idx_j] - pos[idx_k]      # pos_jk
            v2 = pos[idx_i] - pos[idx_j]      # pos_ij
        else:
            v1 = pos[idx_j] - pos[idx_i]      # pos_ji
            v2 = pos[idx_k] - pos[idx_i]      # pos_ki
        a = (v2 * v1).sum(-1) if self._pp else (v1 * v2).sum(-1)
        b_ = jnp.linalg.norm(jnp.cross(v2, v1) if self._pp
                             else jnp.cross(v1, v2), axis=-1)
        angle = jnp.arctan2(b_, a)

        rbf = BesselBasisLayer(self.num_radial, self.cutoff,
                               self.envelope_exponent, name='rbf')(dist)
        sbf = SphericalBasisLayer(self.num_spherical, self.num_radial,
                                  self.cutoff, self.envelope_exponent,
                                  name='sbf')(dist, angle, idx_kj)
        if edge_mask is not None:
            rbf = jnp.where(edge_mask[:, None], rbf, 0)

        x = EmbeddingBlock(self.num_radial, self.hidden_channels,
                           name='emb')(z, rbf, i, j)
        P = self._output(0)(x, rbf, i, n, edge_mask)
        for blk in range(self.num_blocks):
            x = self._interaction(blk)(x, rbf, sbf, idx_kj, idx_ji,
                                       triplet_mask)
            P = P + self._output(blk + 1)(x, rbf, i, n, edge_mask)
        if batch is None:
            return P.sum(0)
        return scatter(P, batch, batch_size, 'sum')


class DimeNetPlusPlus(DimeNet):
    """(reference ``dimenet.py:728``)."""
    int_emb_size: int = 64
    basis_emb_size: int = 8
    out_emb_channels: int = 256

    _pp: bool = True

    def _interaction(self, b):
        return InteractionPPBlock(
            self.hidden_channels, self.int_emb_size,
            self.basis_emb_size, self.num_spherical, self.num_radial,
            self.num_before_skip, self.num_after_skip,
            name=f'interaction_{b}')

    def _output(self, b):
        return OutputPPBlock(
            self.num_radial, self.hidden_channels,
            self.out_emb_channels, self.out_channels,
            self.num_output_layers, self.output_initializer,
            name=f'output_{b}')
