"""Additional graph utilities.

Reference files under ``torch_geometric/utils/``: ``laplacian.py``
(get_laplacian), ``_homophily.py``, ``_assortativity.py``, ``map.py``
(map_index), ``ppr.py``, ``_trim_to_layer.py:20``,
``_train_test_split_edges.py``, ``_normalized_cut.py``, ``_unbatch.py``,
``_shuffle_node.py / mask feature / mask.py``.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import scatter
from .core import degree


def get_laplacian(edge_index, edge_weight: Optional[jnp.ndarray] = None,
                  normalization: Optional[str] = None,
                  num_nodes: Optional[int] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L = D - A (or sym/rw normalised) as COO + weights; the diagonal is
    appended as N self-loop entries (reference ``utils/laplacian.py``)."""
    coo = jnp.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                      else edge_index)
    n = num_nodes if num_nodes is not None else int(coo.max()) + 1
    w = (jnp.ones((coo.shape[1],), jnp.float32) if edge_weight is None
         else edge_weight)
    # reference get_laplacian removes self loops first
    w = jnp.where(coo[0] == coo[1], 0.0, w)
    dst = jnp.minimum(coo[1], n - 1)
    src = jnp.minimum(coo[0], n - 1)
    deg = scatter(w, src, n, 'sum')
    loop = jnp.stack([jnp.arange(n), jnp.arange(n)])
    if normalization is None:
        off_w = -w
        diag_w = deg
    elif normalization == 'sym':
        # reference laplacian.py:77-79 masks inf -> 0 for isolated nodes
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                        0.0)
        off_w = -dis[src] * w * dis[dst]
        diag_w = jnp.ones((n,))
    elif normalization == 'rw':
        # reference laplacian.py:83: deg_inv[ROW] * w, inf masked to 0
        dinv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
        off_w = -dinv[src] * w
        diag_w = jnp.ones((n,))
    else:
        raise ValueError(f"Unknown normalization '{normalization}'")
    out_coo = jnp.concatenate([coo, loop], axis=1)
    out_w = jnp.concatenate([off_w, diag_w])
    return out_coo, out_w


def homophily(edge_index, y: jnp.ndarray, method: str = 'edge',
              num_nodes: Optional[int] = None) -> float:
    """(reference ``utils/_homophily.py``): edge | node | edge_insensitive."""
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    y = np.asarray(y).reshape(-1)
    n = num_nodes or len(y)
    same = (y[coo[0]] == y[coo[1]]).astype(np.float64)
    if method == 'edge':
        return float(same.mean())
    if method == 'node':
        per_node = np.zeros(n)
        cnt = np.zeros(n)
        np.add.at(per_node, coo[1], same)
        np.add.at(cnt, coo[1], 1)
        # reference _homophily.py: mean over ALL nodes (isolated -> 0)
        return float((per_node / np.maximum(cnt, 1)).mean())
    if method == 'edge_insensitive':
        classes = np.unique(y)
        h_edge = same.mean()
        counts = np.array([(y == c).mean() for c in classes])
        denom = 1 - (counts ** 2).sum()
        return float(max(h_edge - (counts ** 2).sum(), 0) / max(denom,
                                                                1e-12))
    raise ValueError(method)


def assortativity(edge_index, num_nodes: Optional[int] = None) -> float:
    """Degree assortativity (Pearson of endpoint degrees; reference
    ``utils/_assortativity.py``)."""
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    n = num_nodes or int(coo.max()) + 1
    out_deg = np.bincount(coo[0], minlength=n)
    in_deg = np.bincount(coo[1], minlength=n)
    xs = out_deg[coo[0]].astype(np.float64)
    ys = in_deg[coo[1]].astype(np.float64)
    xs = xs - xs.mean()
    ys = ys - ys.mean()
    denom = np.sqrt((xs ** 2).sum() * (ys ** 2).sum())
    return float((xs * ys).sum() / max(denom, 1e-12))


def map_index(src: np.ndarray, index: np.ndarray,
              max_index: Optional[int] = None,
              inclusive: bool = False
              ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Map global ids in ``src`` onto positions in ``index`` (reference
    ``utils/map.py:13`` — the hashmap-based relabel). Host-side."""
    src = np.asarray(src)
    index = np.asarray(index)
    n = int(max_index if max_index is not None
            else max(src.max(initial=0), index.max(initial=0))) + 1
    lut = np.full(n, -1, np.int64)
    lut[index] = np.arange(len(index))
    out = lut[src]
    if inclusive:
        if (out < 0).any():
            raise ValueError('src contains ids missing from index')
        return out, None
    mask = out >= 0
    return out[mask], mask


def ppr(edge_index, num_nodes: int, alpha: float = 0.15,
        eps: float = 1e-4) -> Tuple[np.ndarray, np.ndarray]:
    """Approximate personalised PageRank per node via push iterations
    (reference ``utils/ppr.py``, numba -> numpy). Returns dense
    [N, N] scores zeroed below eps as (coo, values)."""
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    n = num_nodes
    a = np.zeros((n, n))
    a[coo[0], coo[1]] = 1.0
    deg = np.maximum(a.sum(1, keepdims=True), 1)
    p = a / deg
    # power iteration of (alpha I + (1-alpha) P^T) applied to I
    x = np.eye(n)
    for _ in range(50):
        x_new = alpha * np.eye(n) + (1 - alpha) * x @ p
        if np.abs(x_new - x).max() < eps * 0.1:
            x = x_new
            break
        x = x_new
    x[x < eps] = 0
    r, c = np.nonzero(x)
    return np.stack([r, c]), x[r, c]


def trim_to_layer(layer: int, num_sampled_nodes_per_hop: List[int],
                  num_sampled_edges_per_hop: List[int],
                  x: jnp.ndarray, edge_index,
                  edge_attr: Optional[jnp.ndarray] = None):
    """Hierarchical-sampling trim (reference ``_trim_to_layer.py:20``):
    at layer L, only nodes/edges needed for the remaining hops are kept.
    Static variant: returns masks rather than slicing (shape-stable under
    jit); slicing happens on the host when shapes may change."""
    n_keep = sum(num_sampled_nodes_per_hop[:len(num_sampled_nodes_per_hop)
                                           - layer])
    e_keep = sum(num_sampled_edges_per_hop[:len(num_sampled_edges_per_hop)
                                           - layer])
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    node_mask = jnp.arange(x.shape[0]) < n_keep
    edge_mask = jnp.arange(coo.shape[1]) < e_keep
    return node_mask, edge_mask


def train_test_split_edges(data, val_ratio: float = 0.05,
                           test_ratio: float = 0.1, seed: int = 0):
    """Legacy edge split (reference ``_train_test_split_edges.py``);
    superseded by transforms.RandomLinkSplit."""
    from ..transforms.splits import RandomLinkSplit
    tr, va, te = RandomLinkSplit(num_val=val_ratio, num_test=test_ratio,
                                 seed=seed)(data)
    return tr, va, te


def normalized_cut(edge_index, edge_weight: jnp.ndarray,
                   num_nodes: Optional[int] = None) -> jnp.ndarray:
    """w * (1/deg(u) + 1/deg(v)) (reference ``_normalized_cut.py``)."""
    coo = jnp.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                      else edge_index)
    n = num_nodes if num_nodes is not None else int(coo.max()) + 1
    # reference _normalized_cut.py:33: deg over COL; zero-degree rows
    # produce inf exactly like the reference
    deg = degree(coo[1], n)
    inv = 1.0 / deg
    return edge_weight * (inv[coo[0]] + inv[coo[1]])


def unbatch(x: np.ndarray, batch: np.ndarray) -> List[np.ndarray]:
    """Split a node tensor by graph (reference ``utils/_unbatch.py``)."""
    x = np.asarray(x)
    batch = np.asarray(batch)
    sizes = np.bincount(batch)
    return list(np.split(x, np.cumsum(sizes)[:-1]))


def unbatch_edge_index(edge_index, batch: np.ndarray
                       ) -> List[np.ndarray]:
    """(reference ``utils/_unbatch.py:unbatch_edge_index``)."""
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    batch = np.asarray(batch)
    ptr = np.concatenate([[0], np.cumsum(np.bincount(batch))])
    eb = batch[coo[0]]
    out = []
    for g in range(len(ptr) - 1):
        m = eb == g
        out.append(coo[:, m] - ptr[g])
    return out


def shuffle_node(x: jnp.ndarray, rng_key,
                 batch: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random node-feature permutation (reference
    ``utils/_shuffle_node.py``); single-graph variant."""
    perm = jax.random.permutation(rng_key, x.shape[0])
    return x[perm], perm


def mask_feature(x: jnp.ndarray, rng_key, p: float = 0.5,
                 mode: str = 'col') -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(reference ``utils/_mask_feature.py``)."""
    if mode == 'col':
        mask = jax.random.uniform(rng_key, (1, x.shape[1])) >= p
    elif mode == 'row':
        mask = jax.random.uniform(rng_key, (x.shape[0], 1)) >= p
    else:
        mask = jax.random.uniform(rng_key, x.shape) >= p
    return x * mask, mask
