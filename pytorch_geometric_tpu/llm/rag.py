"""Graph-RAG utilities (reference
``torch_geometric/llm/large_graph_indexer.py`` and ``rag_loader.py``)."""

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ..data.data import Data


class LargeGraphIndexer:
    """Triplet-store indexer (reference ``large_graph_indexer.py``):
    collects (head, rel, tail) triples, deduplicates nodes, and can emit
    Data subgraphs."""

    def __init__(self):
        self._nodes: Dict[str, int] = {}
        self._triples: List[Tuple[str, str, str]] = []
        self.node_attr: Dict[str, Any] = {}

    @classmethod
    def from_triplets(cls, triplets) -> 'LargeGraphIndexer':
        idx = cls()
        for h, r, t in triplets:
            idx.add_triplet(h, r, t)
        return idx

    def add_triplet(self, h: str, r: str, t: str):
        for v in (h, t):
            if v not in self._nodes:
                self._nodes[v] = len(self._nodes)
        self._triples.append((h, r, t))

    @property
    def num_nodes(self) -> int:
        return len(self._nodes)

    def node_id(self, name: str) -> int:
        return self._nodes[name]

    def to_data(self, node_features: Optional[np.ndarray] = None) -> Data:
        coo = np.array([[self._nodes[h], self._nodes[t]]
                        for h, _, t in self._triples], np.int64).T \
            if self._triples else np.zeros((2, 0), np.int64)
        rels = sorted({r for _, r, _ in self._triples})
        rel_id = {r: i for i, r in enumerate(rels)}
        et = np.array([rel_id[r] for _, r, _ in self._triples], np.int64)
        return Data(x=node_features, edge_index=coo, edge_type=et,
                    num_nodes=self.num_nodes)


@dataclass
class RAGQueryLoader:
    """Retrieval loader (reference ``rag_loader.py``): embed the query,
    select top-k similar nodes, return their k-hop subgraph."""
    indexer: LargeGraphIndexer
    node_embeddings: np.ndarray
    embed_fn: Callable[[str], np.ndarray]
    k_nodes: int = 5
    num_hops: int = 1

    def query(self, question: str) -> Data:
        from ..utils.subgraph import k_hop_subgraph
        q = np.asarray(self.embed_fn(question)).reshape(-1)
        emb = self.node_embeddings
        sim = emb @ q / (np.linalg.norm(emb, axis=1)
                         * max(np.linalg.norm(q), 1e-12) + 1e-12)
        seeds = np.argsort(-sim)[:self.k_nodes]
        data = self.indexer.to_data(self.node_embeddings)
        subset, coo, mapping, emask = k_hop_subgraph(
            seeds, self.num_hops, np.asarray(data.edge_index),
            relabel_nodes=True, num_nodes=data.num_nodes)
        return Data(x=(self.node_embeddings[subset]
                       if self.node_embeddings is not None else None),
                    edge_index=coo, num_nodes=int(subset.size))
