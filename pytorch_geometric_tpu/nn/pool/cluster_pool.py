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
    plus a convenience ``__call__`` for eager use.

    ``edge_score_method``: 'softmax' (per-dst segment softmax, reference
    ``edge_pool.py:87``) | 'tanh' | 'sigmoid'. The reference adds
    ``add_to_edge_score`` (default 0.5) after normalization.
    """
    in_channels: int
    edge_score_method: str = 'softmax'
    add_to_edge_score: float = 0.5

    @fnn.compact
    def compute_edge_score(self, x, edge_index) -> jnp.ndarray:
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        n = x.shape[0]
        feat = jnp.concatenate([x[coo[0]], x[coo[1]]], -1)
        raw = fnn.Dense(1, name='lin')(feat)[:, 0]
        if self.edge_score_method == 'softmax':
            score = segment_softmax(raw, coo[1], n)
        elif self.edge_score_method == 'tanh':
            score = jnp.tanh(raw)
        else:
            score = jax.nn.sigmoid(raw)
        return score + self.add_to_edge_score

    def __call__(self, x, edge_index):
        return self.compute_edge_score(x, edge_index)

    @staticmethod
    def merge(x: np.ndarray, edge_index, score: np.ndarray):
        """Host: greedy non-overlapping contraction (reference
        ``edge_pool.py:_merge_edges``; self edges may be chosen and
        contracted cluster self-loops are kept). Returns
        (new_x, new_edge_index, cluster)."""
        from ...utils.coalesce import coalesce
        coo = np.asarray(edge_index.coo
                         if hasattr(edge_index, 'coo') else edge_index)
        n = x.shape[0]
        order = np.argsort(-np.asarray(score), kind='stable')
        cluster = np.full(n, -1, np.int64)
        nxt = 0
        chosen_score = []
        for e in order:
            s, d = int(coo[0, e]), int(coo[1, e])
            if cluster[s] >= 0 or cluster[d] >= 0:
                continue
            cluster[s] = cluster[d] = nxt
            chosen_score.append(float(score[e]))
            nxt += 1
        for v in range(n):
            if cluster[v] < 0:
                cluster[v] = nxt
                chosen_score.append(1.0)
                nxt += 1
        chosen = np.asarray(chosen_score, x.dtype)
        new_x = np.zeros((nxt, x.shape[1]), x.dtype)
        np.add.at(new_x, cluster, np.asarray(x))
        new_x = new_x * chosen[:, None]
        new_coo = coalesce(cluster[coo], num_nodes=nxt)
        return new_x, new_coo.astype(np.int32), cluster


class ASAPooling(fnn.Module):
    """Adaptive structure-aware pooling, reference-exact semantics
    (reference ``asap.py:84-165``): self-loops added with weight 1
    (existing loop weights preserved), ego-network attention from a
    max-pooled master query, LEConv fitness, SelectTopK(1) selection,
    and :math:`S^\\top A S` coarsening. Static shapes: the coarsened
    adjacency is returned **dense** ``[B*k, B*k]`` (ASAP targets
    graph-classification-sized graphs; the dense product is the
    MXU-friendly form of the reference's sparse ``S.t() @ (A @ S)``).

    Returns ``(x, adj, batch, mask, perm, fitness)``.
    """
    in_channels: int
    ratio: float = 0.5
    negative_slope: float = 0.2
    add_self_loops_out: bool = False

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 batch=None, batch_size: int = 1,
                 max_nodes_per_graph: Optional[int] = None,
                 edge_mask: Optional[jnp.ndarray] = None):
        from .select import SelectTopK
        from ..conv.graph_conv import LEConv
        n = x.shape[0]
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        L = max_nodes_per_graph or n
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src0 = jnp.minimum(coo[0], n - 1)
        dst0 = jnp.minimum(coo[1], n - 1)
        w0 = (edge_weight if edge_weight is not None
              else jnp.ones((src0.shape[0],), x.dtype))
        m0 = (edge_mask if edge_mask is not None
              else jnp.ones((src0.shape[0],), bool))
        # add_remaining_self_loops(fill=1), static edition: original loop
        # edges are masked out and every node gets one appended loop whose
        # weight is the node's existing loop weight (or 1). Duplicate
        # loops resolve deterministically to the LAST edge's weight
        # (reference assignment semantics); a plain .set with duplicate
        # indices would be unspecified under XLA scatter.
        is_loop = (src0 == dst0) & m0
        e_pos = jnp.where(is_loop, jnp.arange(src0.shape[0]), -1)
        last_pos = jnp.full((n + 1,), -1, e_pos.dtype).at[
            jnp.where(is_loop, src0, n)].max(e_pos)[:n]
        loop_w = jnp.where(last_pos >= 0,
                           w0[jnp.maximum(last_pos, 0)], 1.0)
        ar = jnp.arange(n, dtype=src0.dtype)
        src = jnp.concatenate([src0, ar])
        dst = jnp.concatenate([dst0, ar])
        w = jnp.concatenate([w0, loop_w])
        emask = jnp.concatenate([m0 & ~is_loop, jnp.ones((n,), bool)])

        # master query = max over incoming x_pool_j, then attention score
        x_pool_j = x[src]
        x_q = scatter(x_pool_j, dst, n, 'max', mask=emask)
        x_q = fnn.Dense(self.in_channels, name='lin')(x_q)[dst]
        score = fnn.leaky_relu(
            fnn.Dense(1, name='att')(
                jnp.concatenate([x_q, x_pool_j], -1))[:, 0],
            self.negative_slope)
        score = segment_softmax(score, dst, n, mask=emask)
        score = jnp.where(emask, score, 0.0)
        xc = scatter(score[:, None] * x[src], dst, n, 'sum', mask=emask)

        fitness = jax.nn.sigmoid(
            LEConv(out_channels=1, name='gnn_score')(
                xc, jnp.stack([src, dst]), edge_mask=emask)[:, 0])
        sel = SelectTopK(1, self.ratio, name='select')(
            fitness[:, None], batch, batch_size, L)
        safe = jnp.minimum(sel.node_index, n - 1)
        new_x = xc[safe] * fitness[safe][:, None]
        new_x = jnp.where(sel.mask[:, None], new_x, 0)

        # graph coarsening A' = S^T A S with S[i, j] = score(i -> j),
        # columns gathered at the kept nodes (reference asap.py:147-151)
        wv = jnp.where(emask, w, 0.0)
        A = jnp.zeros((n, n), x.dtype).at[src, dst].add(wv)
        S = jnp.zeros((n, n), x.dtype).at[src, dst].add(score)
        S_sel = S[:, safe] * sel.mask[None, :]
        adj = S_sel.T @ (A @ S_sel)
        k = adj.shape[0]
        eye = jnp.eye(k, dtype=bool)
        if self.add_self_loops_out:
            diag = jnp.diagonal(adj)
            fill = jnp.where((diag == 0) & sel.mask, 1.0, diag)
            adj = jnp.where(eye, fill[:, None] * eye, adj)
        else:
            adj = jnp.where(eye, 0.0, adj)
        return new_x, adj, sel.batch, sel.mask, sel.node_index, fitness


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
        # learned head mix (reference mem_pool.py:50 Conv2d(H, 1, 1,
        # bias=False) over the [B, H, N, K] stack) + softmax over clusters
        head_w = self.param('head_mix', fnn.initializers.normal(0.5),
                            (self.heads,))
        s = jnp.einsum('bnhk,h->bnk', s, head_w)
        s = jax.nn.softmax(s, axis=-1)        # [B, N, K]
        s = jnp.where(valid[..., None], s, 0)
        xk = jnp.einsum('bnk,bnf->bkf', s, dense)
        # reference mem_pool.py: lin = Linear(in, out) applied to S^T X;
        # torch's KMeans-style Linear here carries no bias
        out = fnn.Dense(self.out_channels, use_bias=False, name='lin')(xk)
        return out, s

    @staticmethod
    def kl_loss(s: jnp.ndarray) -> jnp.ndarray:
        """Sharpening KL loss (reference ``mem_pool.py:kl_loss``):
        P = S^2 / colsum, row-normalized (rows of padded nodes keep
        denominator 1), then batchmean KL(P || S)."""
        eps = 1e-15
        s2 = (s ** 2) / jnp.maximum(s.sum(1, keepdims=True), eps)
        denom = s2.sum(-1, keepdims=True)
        denom = jnp.where(s.sum(-1, keepdims=True) == 0.0, 1.0, denom)
        p = s2 / denom
        p = jnp.maximum(p, eps)
        s = jnp.maximum(s, eps)
        # torch KLDivLoss(reduction='batchmean'): sum over all elements / B
        return (p * (jnp.log(p) - jnp.log(s))).sum() / s.shape[0]


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
        # the reference drops self-loop edges before scoring
        # (``cluster_pool.py:86``); statically we mask them instead
        not_loop = coo[0] != coo[1]
        if edge_mask is not None:
            not_loop = not_loop & np.asarray(edge_mask)
        src = jnp.minimum(jnp.asarray(coo[0]), n - 1)
        dst = jnp.minimum(jnp.asarray(coo[1]), n - 1)
        e_feat = jnp.concatenate([x[src], x[dst]], -1)
        raw = fnn.Dense(1, name='lin')(e_feat)[:, 0]
        if self.edge_score_method == 'sigmoid':
            score = jax.nn.sigmoid(raw)
            th = 0.5 if self.threshold is None else self.threshold
        elif self.edge_score_method == 'log_softmax':
            score = jax.nn.log_softmax(
                jnp.where(jnp.asarray(not_loop), raw, -jnp.inf))
            th = 0.0 if self.threshold is None else self.threshold
        else:
            score = jnp.tanh(raw)
            th = 0.0 if self.threshold is None else self.threshold
        keep = np.asarray(score > th) & not_loop

        # host union-find over kept edges (== scipy weak connectivity,
        # reference ``cluster_pool.py:118``; min-root union reproduces
        # scipy's first-encounter component numbering)
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

        # pooled features (reference ``cluster_pool.py:122-136``):
        # x_out[c] = sum_j (sum_{i in c} S[j, i]) x[j], where S is the
        # dense edge-score matrix and nodes untouched by any kept edge
        # get S[i, i] = 1 (their own identity weight).
        cl = jnp.asarray(cluster)
        sv = jnp.where(jnp.asarray(not_loop), score, 0.0)
        touched = np.zeros(n, bool)
        touched[coo[0][keep]] = True
        touched[coo[1][keep]] = True
        single = jnp.asarray(~touched)
        # row_w[j, c] = sum over kept-direction edges j->i of S[j,i] for
        # i in cluster c  (+ self weight 1 for singletons)
        row_w = jnp.zeros((n, n), x.dtype).at[src, cl[dst]].add(sv)
        row_w = row_w + (single[:, None] *
                         jax.nn.one_hot(cl, n, dtype=x.dtype))
        pooled = row_w.T @ x                      # [N(>=k), F]; rows >= k are 0

        new_coo = np.stack([cluster[coo[0]], cluster[coo[1]]])
        new_mask = (new_coo[0] != new_coo[1]) & not_loop
        return pooled, cl, jnp.asarray(new_coo), jnp.asarray(new_mask), k
