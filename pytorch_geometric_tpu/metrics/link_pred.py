"""Link-prediction retrieval metrics.

Reference: ``torch_geometric/metrics/link_pred.py:219-840`` — metrics on
top-k candidate matrices: ``pred_index_mat [num_queries, k]`` of
predicted destinations vs ground-truth ``edge_label_index [2, T]``.
All computation is vectorised jax over a dense hit matrix.
"""

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _hit_matrix(pred_index_mat: np.ndarray,
                edge_label_index: np.ndarray,
                num_queries: int):
    """hits [Q, k] bool + per-query ground-truth counts [Q]."""
    pred = np.asarray(pred_index_mat)
    eli = np.asarray(edge_label_index)
    q, k = pred.shape
    truth = [set() for _ in range(num_queries)]
    for s, d in eli.T:
        if s < num_queries:
            truth[int(s)].add(int(d))
    hits = np.zeros((q, k), bool)
    counts = np.zeros(q, np.int64)
    for i in range(q):
        counts[i] = len(truth[i])
        for j in range(k):
            hits[i, j] = int(pred[i, j]) in truth[i]
    return hits, counts


class LinkPredMetric:
    """Streaming metric (reference ``link_pred.py:219``):
    ``update()`` then ``compute()``."""
    higher_is_better = True

    def __init__(self, k: int):
        self.k = k
        self.reset()

    def reset(self):
        self._acc = 0.0
        self._count = 0

    def update(self, pred_index_mat, edge_label_index):
        num_q = pred_index_mat.shape[0]
        hits, counts = _hit_matrix(pred_index_mat[:, :self.k],
                                   edge_label_index, num_q)
        valid = counts > 0
        vals = self._metric(hits[valid], counts[valid])
        self._acc += float(vals.sum())
        self._count += int(valid.sum())

    def compute(self) -> float:
        return self._acc / max(self._count, 1)

    def _metric(self, hits: np.ndarray, counts: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def __repr__(self):
        return f'{self.__class__.__name__}(k={self.k})'


class LinkPredPrecision(LinkPredMetric):
    def _metric(self, hits, counts):
        return hits.sum(1) / self.k


class LinkPredRecall(LinkPredMetric):
    def _metric(self, hits, counts):
        return hits.sum(1) / np.maximum(counts, 1)


class LinkPredF1(LinkPredMetric):
    def _metric(self, hits, counts):
        p = hits.sum(1) / self.k
        r = hits.sum(1) / np.maximum(counts, 1)
        return 2 * p * r / np.maximum(p + r, 1e-12)


class LinkPredMAP(LinkPredMetric):
    def _metric(self, hits, counts):
        prec_at = np.cumsum(hits, 1) / np.arange(1, self.k + 1)
        ap = (prec_at * hits).sum(1) / np.maximum(
            np.minimum(counts, self.k), 1)
        return ap


class LinkPredNDCG(LinkPredMetric):
    def _metric(self, hits, counts):
        disc = 1.0 / np.log2(np.arange(2, self.k + 2))
        dcg = (hits * disc).sum(1)
        idcg = np.array([disc[:min(int(c), self.k)].sum()
                         for c in counts])
        return dcg / np.maximum(idcg, 1e-12)


class LinkPredMRR(LinkPredMetric):
    def _metric(self, hits, counts):
        first = np.argmax(hits, 1)
        has = hits.any(1)
        return np.where(has, 1.0 / (first + 1), 0.0)


class LinkPredHitRatio(LinkPredMetric):
    def _metric(self, hits, counts):
        return hits.any(1).astype(np.float64)


class LinkPredMetricCollection:
    """(reference ``link_pred.py:LinkPredMetricCollection``)."""

    def __init__(self, metrics: Sequence[LinkPredMetric]):
        self.metrics = list(metrics)

    def reset(self):
        for m in self.metrics:
            m.reset()

    def update(self, pred_index_mat, edge_label_index):
        for m in self.metrics:
            m.update(pred_index_mat, edge_label_index)

    def compute(self) -> Dict[str, float]:
        return {repr(m): m.compute() for m in self.metrics}


class LinkPredCoverage(LinkPredMetric):
    """Fraction of the catalog that appears in top-k recommendations
    (reference ``link_pred.py:LinkPredCoverage``)."""
    higher_is_better = True

    def __init__(self, k: int, num_dst_nodes: int):
        self.num_dst_nodes = num_dst_nodes
        super().__init__(k)

    def reset(self):
        self._seen = set()

    def update(self, pred_index_mat, edge_label_index):
        self._seen.update(
            np.asarray(pred_index_mat)[:, :self.k].ravel().tolist())

    def compute(self) -> float:
        return len(self._seen) / max(self.num_dst_nodes, 1)


class LinkPredDiversity(LinkPredMetric):
    """Mean intra-list category diversity (reference
    ``link_pred.py:LinkPredDiversity``): 1 - pairwise same-category
    rate within each user's top-k."""
    higher_is_better = True

    def __init__(self, k: int, category):
        self.category = np.asarray(category)
        super().__init__(k)

    def update(self, pred_index_mat, edge_label_index=None):
        top = np.asarray(pred_index_mat)[:, :self.k]
        cats = self.category[np.minimum(top, len(self.category) - 1)]
        for row in cats:
            kk = len(row)
            if kk < 2:
                continue
            same = sum(int(row[i] == row[j])
                       for i in range(kk) for j in range(i + 1, kk))
            pairs = kk * (kk - 1) / 2
            self._acc += 1.0 - same / pairs
            self._count += 1


class LinkPredPersonalization(LinkPredMetric):
    """Mean pairwise dissimilarity of users' top-k lists (reference
    ``link_pred.py:LinkPredPersonalization``)."""
    higher_is_better = True

    def __init__(self, k: int, max_src_nodes: int = 2 ** 12):
        self.max_src_nodes = max_src_nodes
        super().__init__(k)

    def reset(self):
        self._lists = []

    def update(self, pred_index_mat, edge_label_index=None):
        top = np.asarray(pred_index_mat)[:, :self.k]
        for row in top[:self.max_src_nodes - len(self._lists)]:
            self._lists.append(set(row.tolist()))

    def compute(self) -> float:
        n = len(self._lists)
        if n < 2:
            return 0.0
        sims = []
        for i in range(n):
            for j in range(i + 1, n):
                inter = len(self._lists[i] & self._lists[j])
                # reference link_pred.py: similarity = |A n B| / k
                # ("inverse cosine"), not Jaccard
                sims.append(inter / max(self.k, 1))
        return 1.0 - float(np.mean(sims))


class LinkPredAveragePopularity(LinkPredMetric):
    """Mean popularity of recommended items (reference
    ``link_pred.py:LinkPredAveragePopularity``); lower = more novel."""
    higher_is_better = False

    def __init__(self, k: int, popularity):
        self.popularity = np.asarray(popularity, np.float64)
        super().__init__(k)

    def update(self, pred_index_mat, edge_label_index=None):
        top = np.asarray(pred_index_mat)[:, :self.k]
        pops = self.popularity[np.minimum(top,
                                          len(self.popularity) - 1)]
        self._acc += float(pops.mean(1).sum())
        self._count += top.shape[0]
