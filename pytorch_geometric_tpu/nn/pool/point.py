"""Point-cloud ops: knn / knn_graph / radius / radius_graph / fps.

TPU-native equivalents of the ``torch_cluster`` kernels the reference
wraps at ``nn/pool/__init__.py:63-297``. Fixed-``k`` neighbor search maps
onto dense tiled distance matmuls (MXU-friendly: ||x-y||^2 expands to a
matmul); FPS is a ``lax.fori_loop`` of argmax-over-min-distances with a
static sample count. Cross-batch pairs are excluded by masking with the
``batch`` vectors.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """[N, M] squared distances via the matmul expansion."""
    x2 = (x * x).sum(-1)[:, None]
    y2 = (y * y).sum(-1)[None, :]
    xy = x @ y.T
    return jnp.maximum(x2 + y2 - 2 * xy, 0)


def _masked_dist(x, y, batch_x, batch_y, mask_x, mask_y):
    d = _pairwise_sqdist(x, y)
    big = jnp.inf
    if batch_x is not None and batch_y is not None:
        d = jnp.where(batch_x[:, None] == batch_y[None, :], d, big)
    if mask_x is not None:
        d = jnp.where(mask_x[:, None], d, big)
    if mask_y is not None:
        d = jnp.where(mask_y[None, :], d, big)
    return d


# Above this many distance-matrix entries the dense [M, N] expansion is
# tiled: query tiles of _QT scan over x tiles of _XT with a running
# top-k merge, so peak memory is O(_QT * _XT) instead of O(M * N)
# (100k x 100k f32 would be 40 GB). Each tile's distances still come
# from one MXU matmul.
_DENSE_LIMIT = 1 << 24
_QT = 1024
_XT = 8192


def _knn_indices(y, x, k, batch_y, batch_x, mask_y, mask_x,
                 exclude_self: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest x-rows per y-row -> (idx [M, k], valid [M, k])."""
    m, n = y.shape[0], x.shape[0]
    if k > n:
        # fewer candidates than k: take all n, pad the tail as invalid
        idx, valid = _knn_indices(y, x, n, batch_y, batch_x, mask_y,
                                  mask_x, exclude_self)
        pad = k - n
        idx = jnp.concatenate(
            [idx, jnp.zeros((m, pad), jnp.int32)], axis=1)
        valid = jnp.concatenate(
            [valid, jnp.zeros((m, pad), bool)], axis=1)
        return idx, valid
    if m * n <= _DENSE_LIMIT:
        d = _masked_dist(y, x, batch_y, batch_x, mask_y, mask_x)
        if exclude_self:
            iy = jnp.arange(m)[:, None]
            ix = jnp.arange(n)[None, :]
            d = jnp.where(iy == ix, jnp.inf, d)
        neg, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), jnp.isfinite(-neg)
    return _knn_tiled(y, x, k, batch_y, batch_x, mask_y, mask_x,
                      exclude_self)


def _knn_tiled(y, x, k, batch_y, batch_x, mask_y, mask_x, exclude_self):
    m, n, dim = y.shape[0], x.shape[0], y.shape[-1]
    xt = max(_XT, k)
    m_pad = -(-m // _QT) * _QT
    n_pad = -(-n // xt) * xt
    big = jnp.float32(3.4e38)

    yp = jnp.pad(y.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    xp = jnp.pad(x.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    # fold every per-point exclusion into one int "group" per point:
    # out-of-batch / masked-out / padded points can never match.
    gy = jnp.zeros((m,), jnp.int32) if batch_y is None \
        else batch_y.astype(jnp.int32)
    gx = jnp.zeros((n,), jnp.int32) if batch_x is None \
        else batch_x.astype(jnp.int32)
    if mask_y is not None:
        gy = jnp.where(mask_y, gy, -1)
    if mask_x is not None:
        gx = jnp.where(mask_x, gx, -2)
    gy = jnp.pad(gy, (0, m_pad - m), constant_values=-1)
    gx = jnp.pad(gx, (0, n_pad - n), constant_values=-2)

    n_xtiles = n_pad // xt

    def q_tile(_, qi):
        yq = jax.lax.dynamic_slice(yp, (qi * _QT, 0), (_QT, dim))
        gq = jax.lax.dynamic_slice(gy, (qi * _QT,), (_QT,))
        y2 = (yq * yq).sum(-1)[:, None]

        def body(j, state):
            vals, idxs = state
            xb = jax.lax.dynamic_slice(xp, (j * xt, 0), (xt, dim))
            gb = jax.lax.dynamic_slice(gx, (j * xt,), (xt,))
            x2 = (xb * xb).sum(-1)[None, :]
            d = jnp.maximum(y2 + x2 - 2 * (yq @ xb.T), 0)
            d = jnp.where(gq[:, None] == gb[None, :], d, big)
            if exclude_self:
                iy = qi * _QT + jnp.arange(_QT)[:, None]
                ix = j * xt + jnp.arange(xt)[None, :]
                d = jnp.where(iy == ix, big, d)
            nv, ni = jax.lax.top_k(-d, k)
            cand = (ni + j * xt).astype(jnp.int32)
            allv = jnp.concatenate([vals, nv], axis=1)
            alli = jnp.concatenate([idxs, cand], axis=1)
            bv, sel = jax.lax.top_k(allv, k)
            return bv, jnp.take_along_axis(alli, sel, axis=1)

        v0 = jnp.full((_QT, k), -big)
        i0 = jnp.zeros((_QT, k), jnp.int32)
        vals, idxs = jax.lax.fori_loop(0, n_xtiles, body, (v0, i0))
        return None, (vals, idxs)

    _, (vals, idxs) = jax.lax.scan(q_tile, None,
                                   jnp.arange(m_pad // _QT))
    vals = vals.reshape(m_pad, k)[:m]
    idxs = idxs.reshape(m_pad, k)[:m]
    return idxs, vals > -big / 2


def knn(x: jnp.ndarray, y: jnp.ndarray, k: int,
        batch_x: Optional[jnp.ndarray] = None,
        batch_y: Optional[jnp.ndarray] = None,
        mask_x: Optional[jnp.ndarray] = None,
        mask_y: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each row of ``y``, its ``k`` nearest rows of ``x``
    (reference ``nn/pool/__init__.py:knn``). Returns
    ``edge_index [2, M*k]`` with row 0 = y-index (query), row 1 = x-index,
    plus a validity mask (False where fewer than k in-batch points exist).
    """
    idx, valid = _knn_indices(y, x, k, batch_y, batch_x, mask_y, mask_x,
                              exclude_self=False)
    m = y.shape[0]
    row = jnp.repeat(jnp.arange(m, dtype=jnp.int32), k)
    col = idx.reshape(-1).astype(jnp.int32)
    return jnp.stack([row, col]), valid.reshape(-1)


def knn_graph(x: jnp.ndarray, k: int,
              batch: Optional[jnp.ndarray] = None,
              loop: bool = False,
              mask: Optional[jnp.ndarray] = None,
              flow: str = 'source_to_target'
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN graph over a point set (reference ``knn_graph``).
    Returns (edge_index [2, N*k], edge_mask)."""
    idx, valid = _knn_indices(x, x, k, batch, batch, mask, mask,
                              exclude_self=not loop)
    n = x.shape[0]
    center = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    neighbor = idx.reshape(-1).astype(jnp.int32)
    if flow == 'source_to_target':
        coo = jnp.stack([neighbor, center])
    else:
        coo = jnp.stack([center, neighbor])
    return coo, valid.reshape(-1)


def radius(x: jnp.ndarray, y: jnp.ndarray, r: float,
           batch_x: Optional[jnp.ndarray] = None,
           batch_y: Optional[jnp.ndarray] = None,
           max_num_neighbors: int = 32,
           mask_x: Optional[jnp.ndarray] = None,
           mask_y: Optional[jnp.ndarray] = None
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All x within r of each y, capped at ``max_num_neighbors``
    (reference ``radius``). Static output ``[2, M*max_num_neighbors]``."""
    ei, valid = knn(x, y, max_num_neighbors, batch_x, batch_y, mask_x,
                    mask_y)
    xs = x[jnp.minimum(ei[1], x.shape[0] - 1)]
    ys = y[jnp.minimum(ei[0], y.shape[0] - 1)]
    within = ((xs - ys) ** 2).sum(-1) <= r * r
    return ei, valid & within


def radius_graph(x: jnp.ndarray, r: float,
                 batch: Optional[jnp.ndarray] = None,
                 loop: bool = False, max_num_neighbors: int = 32,
                 mask: Optional[jnp.ndarray] = None,
                 flow: str = 'source_to_target'
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius graph (reference ``radius_graph``)."""
    coo, valid = knn_graph(x, max_num_neighbors, batch, loop, mask, flow)
    src, dst = coo[0], coo[1]
    d2 = ((x[jnp.minimum(src, x.shape[0] - 1)]
           - x[jnp.minimum(dst, x.shape[0] - 1)]) ** 2).sum(-1)
    return coo, valid & (d2 <= r * r)


def fps(pos: jnp.ndarray, ratio: float = 0.5,
        batch: Optional[jnp.ndarray] = None,
        random_start: bool = False,
        num_samples: Optional[int] = None) -> jnp.ndarray:
    """Farthest point sampling (reference ``nn/pool/__init__.py:fps``).

    Single-cloud variant (vmap over clouds for batches): returns the int32
    index array of ``num_samples`` (default ceil(ratio*N)) sampled rows.
    """
    n = pos.shape[0]
    s = num_samples or max(1, math.ceil(ratio * n))
    start = 0

    def body(i, state):
        sel, mind = state
        # distance to the most recent selected point
        last = pos[sel[i - 1]]
        d = ((pos - last[None, :]) ** 2).sum(-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind).astype(jnp.int32)
        sel = sel.at[i].set(nxt)
        return sel, mind

    sel0 = jnp.zeros((s,), jnp.int32).at[0].set(start)
    mind0 = jnp.full((n,), jnp.inf)
    sel, _ = jax.lax.fori_loop(1, s, body, (sel0, mind0))
    return sel


def nearest(x: jnp.ndarray, y: jnp.ndarray,
            batch_x: Optional[jnp.ndarray] = None,
            batch_y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Index of the nearest y-row for every x-row (reference ``nearest``)."""
    idx, _ = _knn_indices(x, y, 1, batch_x, batch_y, None, None,
                          exclude_self=False)
    return idx[:, 0].astype(jnp.int32)


def voxel_grid(pos: jnp.ndarray, size, batch: Optional[jnp.ndarray] = None,
               start=None, end=None) -> jnp.ndarray:
    """Voxel cluster ids (reference ``nn/pool/voxel_grid.py``). Host-free:
    returns a raveled voxel id per point (ids are not compacted)."""
    size = jnp.broadcast_to(jnp.asarray(size, pos.dtype), (pos.shape[-1],))
    lo = pos.min(0) if start is None else jnp.asarray(start, pos.dtype)
    cell = jnp.floor((pos - lo) / size).astype(jnp.int64)
    hi = cell.max(0) + 1
    mult = jnp.concatenate([jnp.cumprod(hi[::-1])[::-1][1:],
                            jnp.ones((1,), jnp.int64)])
    vid = (cell * mult).sum(-1)
    if batch is not None:
        vid = vid + batch.astype(jnp.int64) * jnp.prod(hi)
    return vid


def approx_knn(x: jnp.ndarray, y: jnp.ndarray, k: int,
               batch_x: Optional[jnp.ndarray] = None,
               batch_y: Optional[jnp.ndarray] = None):
    """Approximate KNN (reference ``nn/pool/approx_knn.py`` — pynndescent
    backed). The exact dense-distance kernel is already fast on the MXU,
    so this is an alias kept for API parity."""
    return knn(x, y, k, batch_x, batch_y)


def decimation_indices(ptr, decimation_factor, seed: int = 0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cloud random downsampling by ``decimation_factor`` (reference
    ``nn/pool/decimation.py:9``): each cloud keeps
    ``max(1, floor(count / factor))`` random points. Host-side (the
    result re-indexes the ragged batch); returns ``(indices, new_ptr)``.
    """
    if decimation_factor < 1:
        raise ValueError(
            f"The argument `decimation_factor` should be higher than (or "
            f"equal to) 1 for downsampling. (got {decimation_factor})")
    import numpy as _np
    ptr = _np.asarray(ptr)
    count = ptr[1:] - ptr[:-1]
    decim_count = _np.maximum(count // decimation_factor, 1).astype(ptr.dtype)
    rng = _np.random.default_rng(seed)
    idx = _np.concatenate([
        ptr[i] + rng.permutation(count[i])[:decim_count[i]]
        for i in range(len(count))]) if len(count) else _np.zeros(0, ptr.dtype)
    new_ptr = _np.concatenate([[0], _np.cumsum(decim_count)])
    return jnp.asarray(idx), jnp.asarray(new_ptr)


def approx_knn_graph(x: jnp.ndarray, k: int,
                     batch: Optional[jnp.ndarray] = None,
                     loop: bool = False, flow: str = 'source_to_target'):
    """(reference ``approx_knn.py:approx_knn_graph``) — exact kernel
    alias, see :func:`approx_knn`."""
    return knn_graph(x, k, batch, loop, flow=flow)
