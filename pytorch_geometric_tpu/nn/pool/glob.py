"""Global (graph-level) pooling (reference ``nn/pool/glob.py:8-92``).

All take a static ``size`` (number of graphs) and an optional node
validity ``mask`` so padded batches pool correctly.
"""

from typing import Optional

import jax.numpy as jnp

from ...ops import scatter


def global_add_pool(x: jnp.ndarray, batch: Optional[jnp.ndarray],
                    size: int = 1,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if batch is None:
        return x.sum(0, keepdims=True)
    return scatter(x, batch, size, 'sum', mask=mask)


def global_mean_pool(x: jnp.ndarray, batch: Optional[jnp.ndarray],
                     size: int = 1,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if batch is None:
        return x.mean(0, keepdims=True)
    return scatter(x, batch, size, 'mean', mask=mask)


def global_max_pool(x: jnp.ndarray, batch: Optional[jnp.ndarray],
                    size: int = 1,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if batch is None:
        return x.max(0, keepdims=True)
    return scatter(x, batch, size, 'max', mask=mask)
