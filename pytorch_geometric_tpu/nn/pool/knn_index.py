"""KNN index structures (reference ``nn/pool/knn.py`` — faiss-backed).

TPU design: the "index" is a growing dense embedding matrix and search
is a tiled distance/inner-product matmul + top-k — on the MXU this beats
CPU faiss for the batch sizes GNN pipelines use, with zero extra deps.
The Approx* variants keep the reference API (IVF parameters accepted,
ignored) and search a uniformly sampled subset for sublinear cost.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class KNNOutput(NamedTuple):
    score: jnp.ndarray
    index: jnp.ndarray


class KNNIndex:
    """(reference ``knn.py:15``)."""

    def __init__(self, emb: Optional[jnp.ndarray] = None):
        self._emb = None
        if emb is not None:
            self.add(emb)

    @property
    def numel(self) -> int:
        return 0 if self._emb is None else self._emb.shape[0]

    def add(self, emb):
        emb = jnp.asarray(emb)
        self._emb = emb if self._emb is None \
            else jnp.concatenate([self._emb, emb], 0)

    def _scores(self, emb) -> jnp.ndarray:  # pragma: no cover - abstract
        raise NotImplementedError

    def search(self, emb, k: int,
               exclude_links: Optional[jnp.ndarray] = None) -> KNNOutput:
        emb = jnp.asarray(emb)
        scores = self._scores(emb)                   # [B, N], higher=better
        if exclude_links is not None:
            scores = scores.at[exclude_links[0],
                               exclude_links[1]].set(-jnp.inf)
        k = min(k, self.numel)
        s, i = jax.lax.top_k(scores, k)
        return KNNOutput(score=s, index=i)

    def get_emb(self) -> jnp.ndarray:
        return self._emb


class L2KNNIndex(KNNIndex):
    """Exact L2 search (reference ``knn.py:215``); score = -distance."""

    def _scores(self, emb):
        d = ((emb ** 2).sum(-1)[:, None]
             + (self._emb ** 2).sum(-1)[None, :]
             - 2 * emb @ self._emb.T)
        return -jnp.maximum(d, 0)


class MIPSKNNIndex(KNNIndex):
    """Exact maximum-inner-product search (reference ``knn.py:231``)."""

    def _scores(self, emb):
        return emb @ self._emb.T


class _ApproxMixin:
    def __init__(self, num_cells: int = 100, num_cells_to_visit: int = 10,
                 bits_per_vector: int = 8, emb=None, seed: int = 0):
        self.frac = min(1.0, num_cells_to_visit / max(num_cells, 1))
        self._rng = np.random.default_rng(seed)
        super().__init__(emb)

    def search(self, emb, k: int, exclude_links=None) -> KNNOutput:
        n = self.numel
        m = max(k, int(n * self.frac))
        if m >= n:
            return super().search(emb, k, exclude_links)
        sub = jnp.asarray(np.sort(self._rng.choice(n, m, replace=False)))
        full, self._emb = self._emb, self._emb[sub]
        try:
            out = super().search(emb, k, None)
        finally:
            self._emb = full
        return KNNOutput(score=out.score, index=sub[out.index])


class ApproxL2KNNIndex(_ApproxMixin, L2KNNIndex):
    """(reference ``knn.py:247``)."""


class ApproxMIPSKNNIndex(_ApproxMixin, MIPSKNNIndex):
    """(reference ``knn.py:290``)."""
