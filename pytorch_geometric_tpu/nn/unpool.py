"""knn_interpolate (reference ``torch_geometric/nn/unpool/knn_interpolate.py``)."""

from typing import Optional

import jax.numpy as jnp

from .pool.point import knn
from ..ops import scatter


def knn_interpolate(x: jnp.ndarray, pos_x: jnp.ndarray,
                    pos_y: jnp.ndarray, k: int = 3,
                    batch_x: Optional[jnp.ndarray] = None,
                    batch_y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Inverse-distance weighted interpolation from points x onto y."""
    ei, valid = knn(pos_x, pos_y, k, batch_x, batch_y)
    y_idx, x_idx = ei[0], ei[1]
    x_idx = jnp.minimum(x_idx, pos_x.shape[0] - 1)
    d2 = ((pos_x[x_idx] - pos_y[jnp.minimum(y_idx, pos_y.shape[0] - 1)])
          ** 2).sum(-1)
    w = 1.0 / jnp.maximum(d2, 1e-16)
    w = jnp.where(valid, w, 0)
    num = scatter(x[x_idx] * w[:, None], y_idx, pos_y.shape[0], 'sum')
    den = scatter(w, y_idx, pos_y.shape[0], 'sum')
    return num / jnp.maximum(den, 1e-16)[:, None]
