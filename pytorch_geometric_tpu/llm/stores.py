"""Graph-RAG retrieval backends: KNN seed selection + neighbor-sampled
subgraph retrieval.

Reference: ``torch_geometric/llm/utils/feature_store.py:16``
(``KNNRAGFeatureStore`` — sentence-encoder embeddings + top-k cosine
seed retrieval), ``llm/utils/graph_store.py:24``
(``NeighborSamplingRAGGraphStore`` — a sampler-backed retrieval
subgraph) and ``llm/rag_loader.py:79`` (``RAGQueryLoader`` pipeline:
encode query -> KNN seeds -> neighbor sample -> join features).

TPU redesign notes:

* the query/node similarity runs as one MXU matmul over the normalized
  embedding table (cosine == dot after L2-normalisation) — no
  per-query host loop;
* the sampler is OUR padded fixed-shape :class:`NeighborSampler`
  (``sampler/neighbor_sampler.py``), so retrieval subgraphs reuse one
  compiled program across queries; ``load_subgraph`` compacts the
  padding before handing the Data to the (host-side) LLM stack.
"""

from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from ..data.data import Data
from ..data.stores import InMemoryFeatureStore, InMemoryGraphStore
from ..sampler.base import NodeSamplerInput, SamplerOutput

__all__ = ['KNNRAGFeatureStore', 'NeighborSamplingRAGGraphStore',
           'RAGQueryLoader']


def batch_knn(query_enc: np.ndarray, embeds: np.ndarray, k: int):
    """Top-k cosine neighbors for each query row (reference
    ``llm/utils/backend_utils.py:184``): one [Q, N] dot of the
    L2-normalised tables, then a host top-k per row."""
    import jax.numpy as jnp
    q = jnp.asarray(np.atleast_2d(np.asarray(query_enc, np.float32)))
    e = jnp.asarray(np.asarray(embeds, np.float32))
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True),
                         1e-12)
    en = e / jnp.maximum(jnp.linalg.norm(e, axis=1, keepdims=True),
                         1e-12)
    sim = np.asarray(qn @ en.T)                    # [Q, N] on MXU
    k = min(k, e.shape[0])
    for i in range(sim.shape[0]):
        top = np.argpartition(-sim[i], k - 1)[:k]
        top = top[np.argsort(-sim[i][top])]
        yield top.astype(np.int64), np.asarray(q[i])[None]


class _ConfigMixin:
    """``config`` property + required-key checking shared by both RAG
    stores (reference ``feature_store.py:26-63``)."""

    _required: Tuple[str, ...] = ()

    @property
    def config(self) -> Dict[str, Any]:
        return self._config

    @config.setter
    def config(self, config: Dict[str, Any]) -> None:
        for key in self._required:
            if key not in config:
                raise ValueError(
                    f"Required config parameter '{key}' not found")
            setattr(self, key, config[key])
        self._config = dict(config)


class KNNRAGFeatureStore(_ConfigMixin, InMemoryFeatureStore):
    """Feature store whose seed retrieval is vector KNN over node
    embeddings (reference ``llm/utils/feature_store.py:16``).

    Put node embeddings under ``('node', 'x')`` and (optionally) edge
    embeddings under ``('edge', 'edge_attr')``; configure with
    ``{'k_nodes': int, 'encoder_model': encoder}`` where the encoder
    has ``.encode(list[str]) -> [Q, F]`` (e.g.
    :class:`~pytorch_geometric_tpu.llm.SentenceTransformer`).
    """

    _required = ('k_nodes', 'encoder_model')

    def __init__(self) -> None:
        super().__init__()
        self.encoder_model = None
        self.k_nodes: Optional[int] = None
        self._config: Dict[str, Any] = {}

    @property
    def x(self) -> np.ndarray:
        return np.asarray(self.get_tensor('node', 'x'))

    @property
    def edge_attr(self) -> np.ndarray:
        return np.asarray(self.get_tensor('edge', 'edge_attr'))

    def retrieve_seed_nodes(self, query: Union[str, List[str]],
                            k_nodes: Optional[int] = None):
        """Indices of the ``k_nodes`` most query-similar nodes plus
        the encoded query (reference ``feature_store.py:76``). A
        single query returns ``(indices, query_enc)``; a batch returns
        ``{query: (indices, query_enc)}``."""
        single = not isinstance(query, (list, tuple))
        queries = [query] if single else list(query)
        k = k_nodes if k_nodes is not None else self.k_nodes
        assert k is not None, 'please set k_nodes via config'
        assert self.encoder_model is not None, \
            'Need to define encoder model from config'
        enc = self.encoder_model.encode(queries)
        results = list(batch_knn(np.asarray(enc), self.x, k))
        if single:
            return results[0]
        return {q: r for q, r in zip(queries, results)}

    def retrieve_seed_edges(self, query: Union[str, List[str]],
                            k_edges: int = 3):
        """Top-k query-similar edges by edge embedding (reference
        ``rag_loader.py:33`` protocol)."""
        single = not isinstance(query, (list, tuple))
        queries = [query] if single else list(query)
        assert self.encoder_model is not None, \
            'Need to define encoder model from config'
        enc = self.encoder_model.encode(queries)
        results = list(batch_knn(np.asarray(enc), self.edge_attr,
                                 k_edges))
        if single:
            return results[0]
        return {q: r for q, r in zip(queries, results)}

    def load_subgraph(self, sample: SamplerOutput,
                      induced: bool = True) -> Data:
        """Join features onto a (padded) sampler output, compacting
        the padding (reference ``feature_store.py:125``)."""
        nmask = np.asarray(sample.node_mask, bool)
        emask = np.asarray(sample.edge_mask, bool)
        node = np.asarray(sample.node)[nmask]
        edge_id = np.asarray(sample.edge)[emask]
        # local edge endpoints index the PADDED node slots; compact
        new_pos = np.cumsum(nmask) - 1
        row = new_pos[np.asarray(sample.row)[emask]]
        col = new_pos[np.asarray(sample.col)[emask]]
        x = self.x[node]
        try:
            edge_attr = self.edge_attr[edge_id]
        except KeyError:
            edge_attr = None
        data = Data(x=x, edge_attr=edge_attr,
                    edge_index=(np.stack([row, col])
                                if induced else np.stack(
                                    [node[row], node[col]])),
                    num_nodes=int(node.shape[0]))
        return data.replace(node_idx=node, edge_idx=edge_id)


class NeighborSamplingRAGGraphStore(_ConfigMixin, InMemoryGraphStore):
    """Graph store whose retrieval is neighbor sampling around the
    seed nodes (reference ``llm/utils/graph_store.py:24``), backed by
    our padded fixed-shape sampler."""

    _required = ('num_neighbors',)

    def __init__(self, feature_store=None, **sample_kwargs) -> None:
        super().__init__()
        self.feature_store = feature_store
        self.sample_kwargs = dict(sample_kwargs)
        self.num_neighbors = None
        self._config: Dict[str, Any] = {}
        self._sampler = None
        self._edge_index: Optional[np.ndarray] = None
        self.num_nodes = 0

    @_ConfigMixin.config.setter
    def config(self, config: Dict[str, Any]) -> None:
        _ConfigMixin.config.fset(self, config)
        self._sampler = None      # fanouts changed: rebuild

    def register_feature_store(self, feature_store) -> None:
        self.feature_store = feature_store
        self._sampler = None

    @property
    def edge_index(self) -> np.ndarray:
        return self._edge_index

    @edge_index.setter
    def edge_index(self, edge_index) -> None:
        ei = np.asarray(edge_index, np.int64)
        if ei.ndim != 2 or ei.shape[0] != 2:
            ei = np.stack([np.asarray(edge_index[0]),
                           np.asarray(edge_index[1])]).astype(np.int64)
        self._edge_index = ei
        self.num_nodes = int(ei.max()) + 1 if ei.size else 0
        self.put_edge_index(ei, edge_type=None, layout='coo',
                            size=(self.num_nodes, self.num_nodes))
        self._sampler = None

    def _init_sampler(self):
        from ..sampler.neighbor_sampler import NeighborSampler
        if self._edge_index is None:
            raise AttributeError('edge_index not set yet.')
        assert self.num_neighbors is not None, \
            'Please set num_neighbors through config'
        # retrieval wants context around the seeds regardless of edge
        # direction (the reference uses BidirectionalNeighborSampler):
        # sample over the union graph, mapping sampled union-edge ids
        # back to original ids (reverse copies share the original id)
        e = self._edge_index.shape[1]
        both = np.concatenate([self._edge_index,
                               self._edge_index[::-1]], axis=1)
        self._eid_map = np.concatenate(
            [np.arange(e), np.arange(e)]).astype(np.int64)
        self._sampler = NeighborSampler(
            (both, self.num_nodes),
            num_neighbors=self.num_neighbors, **self.sample_kwargs)

    def sample_subgraph(self, seed_nodes) -> SamplerOutput:
        """Neighbor-sample around the seeds (reference
        ``graph_store.py:170``); edge ids in the output refer to the
        ORIGINAL (directed) edge list."""
        if self._sampler is None:
            self._init_sampler()
        seeds = np.unique(np.asarray(seed_nodes).reshape(-1))
        out = self._sampler.sample_from_nodes(
            NodeSamplerInput(node=seeds))
        eid = np.asarray(out.edge)
        out.edge = self._eid_map[np.minimum(
            eid, max(len(self._eid_map) - 1, 0))]
        return out


class RAGQueryLoader:
    """Query pipeline over a ``(RAGFeatureStore, RAGGraphStore)`` pair
    (reference ``llm/rag_loader.py:79``): encode the query, KNN the
    seed nodes, neighbor-sample their subgraph, join features."""

    def __init__(self, graph_data: Tuple[KNNRAGFeatureStore,
                                         NeighborSamplingRAGGraphStore],
                 subgraph_filter: Optional[Callable[[Data, Any],
                                                    Data]] = None,
                 augment_query: bool = False,
                 vector_retriever=None,
                 config: Optional[Dict[str, Any]] = None):
        self.feature_store, self.graph_store = graph_data
        self.vector_retriever = vector_retriever
        self.augment_query = augment_query
        self.graph_store.register_feature_store(self.feature_store)
        self.subgraph_filter = subgraph_filter
        if config is not None:
            self.config = config

    @property
    def config(self) -> Dict[str, Any]:
        return self._config

    @config.setter
    def config(self, config: Dict[str, Any]) -> None:
        # each store picks out its own required keys
        self.feature_store.config = config
        self.graph_store.config = config
        self._config = dict(config)

    def query(self, query: Any) -> Data:
        """Retrieve the query's subgraph with features attached."""
        retrieved_docs = None
        if self.vector_retriever is not None:
            retrieved_docs = self.vector_retriever.query(query)
        if self.augment_query and retrieved_docs:
            query = ' '.join([query] + [str(d) for d in retrieved_docs])

        seed_nodes, query_enc = \
            self.feature_store.retrieve_seed_nodes(query)
        sample = self.graph_store.sample_subgraph(seed_nodes)
        data = self.feature_store.load_subgraph(sample=sample)
        data = data.replace(seed_nodes=np.asarray(seed_nodes),
                            query_enc=np.asarray(query_enc))
        if self.subgraph_filter is not None:
            data = self.subgraph_filter(data, query)
        if retrieved_docs is not None:
            data._store['text_context'] = retrieved_docs
        return data
