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


def avg_pool_neighbor_x(data, flow: str = 'source_to_target'):
    """Replace x with neighborhood means (reference
    ``nn/pool/avg_pool.py:96``)."""
    return _pool_neighbor_x(data, 'mean', flow)


def max_pool_neighbor_x(data, flow: str = 'source_to_target'):
    """(reference ``nn/pool/max_pool.py:91``)."""
    return _pool_neighbor_x(data, 'max', flow)


def _pool_neighbor_x(data, reduce: str, flow: str):
    from ...ops import scatter as _scatter
    from ...utils.loop import add_self_loops as _asl
    n = data.num_nodes
    coo = data.edge_index
    coo = coo.coo if hasattr(coo, 'coo') else jnp.asarray(coo)
    coo, _ = _asl(coo, None, num_nodes=n)
    row, col = (coo[0], coo[1]) if flow == 'source_to_target' \
        else (coo[1], coo[0])
    x = jnp.asarray(data.x)
    data.x = _scatter(x[jnp.minimum(row, n - 1)],
                      jnp.minimum(col, n - 1), n, reduce)
    return data
