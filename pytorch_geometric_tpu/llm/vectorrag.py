"""VectorRAG — embedding-based document retrieval
(reference ``torch_geometric/llm/utils/vectorrag.py``).

The k-NN over document embeddings runs through the tiled MXU distance
kernel (``nn/pool/point.py``), so 100k+ document stores work without a
dense [Q, N] materialisation.
"""

import json
import os
from typing import Any, Callable, List, Optional

import jax.numpy as jnp
import numpy as np


class VectorRetriever:
    """Protocol: ``query(...) -> context`` (reference
    ``vectorrag.py:14``)."""

    def query(self, query: Any, **kwargs) -> Any:
        raise NotImplementedError


class DocumentRetriever(VectorRetriever):
    """Top-k document retrieval by embedding distance (reference
    ``vectorrag.py:23``).

    Args:
        raw_docs: the document strings.
        embedded_docs: optional precomputed ``[N, F]`` embeddings.
        k_for_docs: how many documents per query.
        model: encoder callable ``str | List[str] -> array`` used when
            embeddings are absent (e.g. ``SentenceTransformer``).
    """

    def __init__(self, raw_docs: List[str],
                 embedded_docs: Optional[jnp.ndarray] = None,
                 k_for_docs: int = 2,
                 model: Optional[Callable] = None,
                 model_kwargs: Optional[dict] = None):
        self.raw_docs = list(raw_docs)
        self.k_for_docs = k_for_docs
        self.encoder = model
        self.model_kwargs = dict(model_kwargs or {})
        if embedded_docs is None:
            if model is None:
                raise ValueError('Model must be provided if '
                                 'embedded_docs is not provided')
            embedded_docs = self.encoder(self.raw_docs,
                                         **self.model_kwargs)
            self.model_kwargs.pop('verbose', None)
        self.embedded_docs = jnp.asarray(embedded_docs)

    def query(self, query) -> List[str]:
        if isinstance(query, str):
            q = jnp.asarray(self.encoder(query, **self.model_kwargs))
        else:
            q = jnp.asarray(query)
        if q.ndim == 1:
            q = q[None]
        from ..nn.pool.point import _knn_indices
        idx, _ = _knn_indices(q, self.embedded_docs,
                              min(self.k_for_docs,
                                  len(self.raw_docs)),
                              None, None, None, None,
                              exclude_self=False)
        return [self.raw_docs[int(i)] for i in np.asarray(idx[0])]

    def save(self, path: str) -> None:
        np.save(path + '.npy', np.asarray(self.embedded_docs))
        with open(path + '.json', 'w') as f:
            json.dump({'raw_docs': self.raw_docs,
                       'k_for_docs': self.k_for_docs}, f)

    @classmethod
    def load(cls, path: str, model: Optional[Callable] = None
             ) -> 'DocumentRetriever':
        if not os.path.exists(path + '.json'):
            raise FileNotFoundError(path + '.json')
        with open(path + '.json') as f:
            meta = json.load(f)
        emb = np.load(path + '.npy')
        return cls(meta['raw_docs'], embedded_docs=emb,
                   k_for_docs=meta['k_for_docs'], model=model)
