"""Cluster-based pooling: graclus, avg_pool/max_pool, EdgePooling,
ASAPooling, MemPooling.

Reference files under ``torch_geometric/nn/pool/``: ``graclus.py``
(torch-cluster greedy matching), ``avg_pool.py``, ``max_pool.py``,
``edge_pool.py``, ``asap.py``, ``mem_pool.py``.
"""

from typing import NamedTuple, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import scatter, softmax as segment_softmax


def graclus(edge_index, num_nodes: int,
            edge_weight: Optional[np.ndarray] = None,
            seed: int = 0) -> np.ndarray:
    """Greedy heavy-edge matching (host; reference ``graclus.py`` ->
    torch-cluster). Returns cluster ids (non-compacted)."""
    coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                     else edge_index)
    w = (np.asarray(edge_weight) if edge_weight is not None
         else np.ones(coo.shape[1]))
    rng = np.random.default_rng(seed)
    cluster = np.full(num_nodes, -1, np.int64)
    order = rng.permutation(num_nodes)
    # adjacency lists
    by_src = {}
    for e in range(coo.shape[1]):
        by_src.setdefault(int(coo[0, e]), []).append(
            (int(coo[1, e]), float(w[e])))
    nxt = 0
    for v in order:
        if cluster[v] >= 0:
            continue
        best, best_w = -1, -1.0
        for u, wt in by_src.get(int(v), ()):
            if cluster[u] < 0 and u != v and wt > best_w:
                best, best_w = u, wt
        cluster[v] = nxt
        if best >= 0:
            cluster[best] = nxt
        nxt += 1
    return cluster


def _consecutive(cluster: np.ndarray) -> Tuple[np.ndarray, int]:
    uniq, inv = np.unique(cluster, return_inverse=True)
    return inv, len(uniq)


def avg_pool(cluster: np.ndarray, data) -> 'object':
    """Coarsen graph by clusters with mean features (reference
    ``avg_pool.py``). Host-side."""
    return _pool(cluster, data, 'mean')


def max_pool(cluster: np.ndarray, data):
    """(reference ``max_pool.py``)."""
    return _pool(cluster, data, 'max')


def _pool(cluster, data, reduce):
    from ...data.data import Data
    from ...utils.coalesce import coalesce
    cluster, k = _consecutive(np.asarray(cluster))
    x = np.asarray(data.x)
    out = np.zeros((k, x.shape[1]), x.dtype)
    if reduce == 'mean':
        cnt = np.bincount(cluster, minlength=k)
        np.add.at(out, cluster, x)
        out = out / np.maximum(cnt[:, None], 1)
    else:
        out[:] = -np.inf
        np.maximum.at(out, cluster, x)
        out[~np.isfinite(out)] = 0
    coo = np.asarray(data.edge_index.coo
                     if hasattr(data.edge_index, 'coo')
                     else data.edge_index)
    new_coo = cluster[coo]
    keep = new_coo[0] != new_coo[1]
    new_coo = coalesce(new_coo[:, keep], num_nodes=k) if keep.any() \
        else np.zeros((2, 0), np.int64)
    kwargs = {}
    if data.pos is not None:
        pos = np.asarray(data.pos)
        ps = np.zeros((k, pos.shape[1]))
        np.add.at(ps, cluster, pos)
        kwargs['pos'] = (ps / np.maximum(
            np.bincount(cluster, minlength=k)[:, None], 1)).astype(
                np.float32)
    return Data(x=out, edge_index=new_coo.astype(np.int32),
                num_nodes=k, cluster=cluster, **kwargs)


def avg_pool_x(cluster: jnp.ndarray, x: jnp.ndarray,
               num_clusters: int) -> jnp.ndarray:
    """(reference ``avg_pool.py:avg_pool_x``) — jit-safe."""
    return scatter(x, cluster, num_clusters, 'mean')


def max_pool_x(cluster: jnp.ndarray, x: jnp.ndarray,
               num_clusters: int) -> jnp.ndarray:
    return scatter(x, cluster, num_clusters, 'max')


class EdgePooling(fnn.Module):
    """Edge-contraction pooling (reference ``edge_pool.py``): score
    edges, greedily merge highest-scoring non-conflicting pairs.
    Greedy matching runs on the host between jitted halves, so this
    module exposes ``compute_edge_score`` (device) and ``merge`` (host)
    plus a convenience ``__call__`` for eager use."""
    in_channels: int

    @fnn.compact
    def compute_edge_score(self, x, edge_index) -> jnp.ndarray:
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        feat = jnp.concatenate([x[coo[0]], x[coo[1]]], -1)
        raw = fnn.Dense(1, name='lin')(feat)[:, 0]
        return jax.nn.softmax(raw)

    def __call__(self, x, edge_index):
        return self.compute_edge_score(x, edge_index)

    @staticmethod
    def merge(x: np.ndarray, edge_index, score: np.ndarray):
        """Host: greedy non-overlapping contraction; returns
        (new_x, new_edge_index, cluster)."""
        from ...utils.coalesce import coalesce
        coo = np.asarray(edge_index.coo
                         if hasattr(edge_index, 'coo') else edge_index)
        n = x.shape[0]
        order = np.argsort(-np.asarray(score))
        cluster = np.full(n, -1, np.int64)
        nxt = 0
        chosen_score = np.zeros(n)
        for e in order:
            s, d = int(coo[0, e]), int(coo[1, e])
            if cluster[s] < 0 and cluster[d] < 0 and s != d:
                cluster[s] = cluster[d] = nxt
                chosen_score[nxt] = score[e]
                nxt += 1
        for v in range(n):
            if cluster[v] < 0:
                cluster[v] = nxt
                chosen_score[nxt] = 1.0
                nxt += 1
        new_x = np.zeros((nxt, x.shape[1]), x.dtype)
        np.add.at(new_x, cluster, np.asarray(x))
        new_x = new_x * (chosen_score[:nxt, None])
        new_coo = cluster[coo]
        keep = new_coo[0] != new_coo[1]
        new_coo = (coalesce(new_coo[:, keep], num_nodes=nxt)
                   if keep.any() else np.zeros((2, 0), np.int64))
        return new_x, new_coo.astype(np.int32), cluster


class ASAPooling(fnn.Module):
    """Adaptive structure-aware pooling (reference ``asap.py``),
    static-shape: keeps ceil(ratio * max_nodes) slots via select_topk."""
    in_channels: int
    ratio: float = 0.5

    @fnn.compact
    def __call__(self, x, edge_index, batch=None, batch_size: int = 1,
                 max_nodes_per_graph: Optional[int] = None,
                 edge_mask: Optional[jnp.ndarray] = None):
        from .select import select_topk, filter_edges
        n = x.shape[0]
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        L = max_nodes_per_graph or n
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        # cluster representation: attention over the 1-hop ego network
        m = scatter(x[src], dst, n, 'max', mask=edge_mask)
        q = fnn.Dense(self.in_channels, name='lin_q')(m)
        score_e = fnn.leaky_relu(
            fnn.Dense(1, name='att')(
                jnp.concatenate([q[dst], x[src]], -1))[:, 0], 0.2)
        alpha = segment_softmax(score_e, dst, n, mask=edge_mask)
        xc = scatter(alpha[:, None] * x[src], dst, n, 'sum',
                     mask=edge_mask)
        fitness = jax.nn.sigmoid(
            fnn.Dense(1, use_bias=False, name='gnn_score')(xc)[:, 0])
        sel = select_topk(fitness, batch, batch_size, self.ratio, L)
        safe = jnp.minimum(sel.node_index, n - 1)
        new_x = xc[safe] * sel.weight[:, None]
        new_x = jnp.where(sel.mask[:, None], new_x, 0)
        new_coo, keep = filter_edges(coo, sel, n)
        return new_x, new_coo, keep, sel.batch, sel.mask


class MemPooling(fnn.Module):
    """Memory-based soft clustering (reference ``mem_pool.py``):
    student-t assignment to K learned centroids, H heads."""
    in_channels: int
    out_channels: int
    heads: int = 4
    num_clusters: int = 2
    tau: float = 1.0

    @fnn.compact
    def __call__(self, x, batch=None, batch_size: int = 1,
                 mask: Optional[jnp.ndarray] = None):
        from ...utils.dense import to_dense_batch
        squeeze = x.ndim == 2
        if squeeze:
            dense, valid = to_dense_batch(x, batch, batch_size,
                                          x.shape[0])
        else:
            dense, valid = x, (mask if mask is not None else
                               jnp.ones(x.shape[:2], bool))
        keys = self.param('keys', fnn.initializers.normal(1.0),
                          (self.heads, self.num_clusters,
                           dense.shape[-1]))
        d2 = ((dense[:, :, None, None, :] - keys[None, None]) ** 2
              ).sum(-1)                       # [B, N, H, K]
        s = (1 + d2 / self.tau) ** (-(self.tau + 1) / 2)
        s = s / jnp.maximum(s.sum(-1, keepdims=True), 1e-12)
        s = s.mean(2)                         # head-average [B, N, K]
        s = jnp.where(valid[..., None], s, 0)
        xk = jnp.einsum('bnk,bnf->bkf', s, dense)
        out = fnn.Dense(self.out_channels, name='lin')(xk)
        return out, s

    @staticmethod
    def kl_loss(s: jnp.ndarray) -> jnp.ndarray:
        """Sharpening KL loss (reference ``mem_pool.py:kl_loss``)."""
        s2 = (s ** 2) / jnp.maximum(s.sum(1, keepdims=True), 1e-12)
        p = s2 / jnp.maximum(s2.sum(-1, keepdims=True), 1e-12)
        return (p * jnp.log(jnp.maximum(p, 1e-12)
                            / jnp.maximum(s, 1e-12))).sum(-1).mean()


class ClusterPooling(fnn.Module):
    """Edge-based graph component pooling (reference
    ``nn/pool/cluster_pool.py:21``): score each edge, keep edges above a
    threshold, contract the resulting connected components (host-side
    union-find, like graclus here) with sum aggregation.

    Returns (x_pooled [N, F] padded, cluster [N], edge_index', edge_mask',
    num_clusters). Static shapes: pooled x keeps N rows (empty clusters
    are zero).
    """
    in_channels: int
    edge_score_method: str = 'tanh'
    threshold: Optional[float] = None

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None):
        n = x.shape[0]
        coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                         else edge_index)
        src = jnp.minimum(jnp.asarray(coo[0]), n - 1)
        dst = jnp.minimum(jnp.asarray(coo[1]), n - 1)
        e_feat = jnp.concatenate([x[src], x[dst]], -1)
        raw = fnn.Dense(1, name='lin')(e_feat)[:, 0]
        if self.edge_score_method == 'sigmoid':
            score = jax.nn.sigmoid(raw)
            th = 0.5 if self.threshold is None else self.threshold
        elif self.edge_score_method == 'log_softmax':
            score = jax.nn.log_softmax(raw)
            th = 0.0 if self.threshold is None else self.threshold
        else:
            score = jnp.tanh(raw)
            th = 0.0 if self.threshold is None else self.threshold
        keep = np.asarray(score > th)
        if edge_mask is not None:
            keep = keep & np.asarray(edge_mask)

        # host union-find over kept edges
        parent = np.arange(n)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for s, d in zip(coo[0][keep], coo[1][keep]):
            rs, rd = find(int(s)), find(int(d))
            if rs != rd:
                parent[max(rs, rd)] = min(rs, rd)
        roots = np.asarray([find(v) for v in range(n)])
        uniq, cluster = np.unique(roots, return_inverse=True)
        k = len(uniq)

        cl = jnp.asarray(cluster)
        pooled = jnp.zeros_like(x).at[cl].add(x)
        new_coo = np.stack([cluster[coo[0]], cluster[coo[1]]])
        new_mask = new_coo[0] != new_coo[1]
        if edge_mask is not None:
            new_mask = new_mask & np.asarray(edge_mask)
        return pooled, cl, jnp.asarray(new_coo), jnp.asarray(new_mask), k
