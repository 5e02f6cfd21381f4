"""RAG backend utilities: graph construction from triples, remote
backend loaders, and the PCST retrieval filter.

Reference: ``torch_geometric/llm/utils/backend_utils.py`` —
``create_graph_from_triples:292``,
``create_remote_backend_from_graph_data:322``,
``retrieval_via_pcst:54`` (G-Retriever's Prize-Collecting Steiner Tree
subgraph filter, backed there by the ``pcst_fast`` C++ solver),
``make_pcst_filter:367``.

``pcst_fast`` is absent from this image; :func:`_pcst_approx` solves
the same instance with the classic metric-closure Steiner
2-approximation (Dijkstra from the prize terminals + MST over the
terminal closure + path expansion) followed by Goemans-Williamson-style
leaf pruning (drop leaves whose prize doesn't pay their attachment
cost). The surrounding prize/cost construction — ranked node prizes,
top-k edge prizes, the virtual-node split for edges whose prize
exceeds their cost — is the reference's, so swapping in an exact
solver changes nothing upstream.
"""

import os
from dataclasses import dataclass
from enum import Enum, auto
from typing import (Any, Callable, Dict, Iterable, List, Optional,
                    Tuple, Type, Union)

import numpy as np

from ..data.data import Data
from .rag import EDGE_RELATION, LargeGraphIndexer, TripletLike

__all__ = ['preprocess_triplet', 'retrieval_via_pcst',
           'create_graph_from_triples',
           'create_remote_backend_from_graph_data',
           'RemoteGraphBackendLoader', 'RemoteDataType',
           'make_pcst_filter']


def preprocess_triplet(triplet: TripletLike) -> TripletLike:
    """Lower-case normalisation (reference ``backend_utils.py:48``)."""
    h, r, t = triplet
    return str(h).lower(), str(r).lower(), str(t).lower()


# ---------------------------------------------------------------------------
# approximate PCST solver
# ---------------------------------------------------------------------------


def _pcst_approx(edges: np.ndarray, prizes: np.ndarray,
                 costs: np.ndarray, num_clusters: int = 1
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Metric-closure Steiner 2-approximation of the PCST instance
    (same in/out contract as ``pcst_fast``): returns (vertices,
    edge positions into ``edges``)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import dijkstra, minimum_spanning_tree

    n = len(prizes)
    m = len(edges)
    if m == 0 or n == 0:
        return np.nonzero(prizes > 0)[0], np.zeros(0, np.int64)
    terminals = np.argsort(-prizes)
    terminals = terminals[prizes[terminals] > 0][:64]
    if len(terminals) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    w = np.maximum(costs, 1e-9)
    # undirected closure graph; remember each (u, v)'s edge position
    u, v = edges[:, 0], edges[:, 1]
    adj = sp.csr_matrix(
        (np.concatenate([w, w]),
         (np.concatenate([u, v]), np.concatenate([v, u]))),
        shape=(n, n))
    epos: Dict[Tuple[int, int], int] = {}
    for i in range(m):
        for key in ((int(u[i]), int(v[i])), (int(v[i]), int(u[i]))):
            if key not in epos or costs[epos[key]] > costs[i]:
                epos[key] = i

    dist, pred = dijkstra(adj, indices=terminals,
                          return_predecessors=True)
    t = len(terminals)
    closure = dist[:, terminals]                     # [t, t]
    closure[~np.isfinite(closure)] = 0.0             # unreachable: cut
    mst = minimum_spanning_tree(sp.csr_matrix(closure)).tocoo()
    mst_edges = sorted(zip(mst.data, mst.row, mst.col))
    # k clusters: drop the k-1 most expensive closure connections
    if num_clusters > 1 and len(mst_edges) >= num_clusters:
        mst_edges = mst_edges[:len(mst_edges) - (num_clusters - 1)]

    sel_edges: List[int] = []
    seen = set()
    nodes = {int(terminals[0])}
    for _, a, b in mst_edges:
        # walk b's shortest path back to terminal a via predecessors
        cur = int(terminals[b])
        nodes.add(cur)
        while cur != terminals[a] and pred[a, cur] >= 0:
            nxt = int(pred[a, cur])
            key = (nxt, cur)
            if key in epos and epos[key] not in seen:
                seen.add(epos[key])
                sel_edges.append(epos[key])
            nodes.add(nxt)
            cur = nxt

    # GW-style pruning: peel degree-1 nodes whose prize < their
    # attachment cost (keeps the tree paying for itself)
    sel = np.asarray(sorted(sel_edges), np.int64)
    root_term = int(terminals[0])
    changed = True
    while changed and len(sel):
        changed = False
        deg: Dict[int, List[int]] = {}
        for i in sel:
            deg.setdefault(int(u[i]), []).append(int(i))
            deg.setdefault(int(v[i]), []).append(int(i))
        drop = set()
        for node, eids in deg.items():
            if len(eids) == 1 and prizes[node] < costs[eids[0]] \
                    and node != root_term:
                drop.add(eids[0])
                nodes.discard(node)
                changed = True
        if drop:
            sel = np.asarray([i for i in sel if i not in drop],
                             np.int64)
    for i in sel:
        nodes.add(int(u[i]))
        nodes.add(int(v[i]))
    return np.asarray(sorted(nodes), np.int64), sel


def _get(data: Data, key: str):
    return data._store.get(key)


def retrieval_via_pcst(data: Data, q_emb: np.ndarray, textual_nodes,
                       textual_edges, topk: int = 3, topk_e: int = 5,
                       cost_e: float = 0.5, num_clusters: int = 1
                       ) -> Tuple[Data, str]:
    """Prize-Collecting-Steiner-Tree subgraph filter (reference
    ``backend_utils.py:54``): node prizes rank query/node cosine
    similarity top-k down to 1; edge prizes follow the reference's
    tie-aware top-k scheme; edges whose prize exceeds their cost split
    into zero-cost virtual-node pairs so the solver can harvest them."""
    x = None if _get(data, 'x') is None else np.asarray(data.x)
    ea = None if _get(data, 'edge_attr') is None else \
        np.asarray(data.edge_attr)
    ei = None if _get(data, 'edge_index') is None else \
        np.asarray(data.edge_index)
    degenerate = (ea is None or ea.size == 0 or x is None
                  or x.size == 0 or ei is None or ei.size == 0)
    if degenerate:
        desc = textual_nodes.to_csv(index=False) + '\n' + \
            textual_edges.to_csv(index=False,
                                 columns=['src', 'edge_attr', 'dst'])
        return data, desc

    q = np.asarray(q_emb, np.float32).reshape(-1)
    qn = q / max(np.linalg.norm(q), 1e-12)

    def cos(table):
        t = np.asarray(table, np.float32)
        return (t @ qn) / np.maximum(
            np.linalg.norm(t, axis=1), 1e-12)

    num_nodes = int(data.num_nodes)
    num_edges = ei.shape[1]
    c = 0.01
    if topk > 0:
        sim = cos(x)
        k = min(topk, num_nodes)
        top = np.argsort(-sim)[:k]
        n_prizes = np.zeros(num_nodes, np.float64)
        n_prizes[top] = np.arange(k, 0, -1)
    else:
        n_prizes = np.zeros(num_nodes, np.float64)

    if topk_e > 0:
        e_prizes = cos(ea).astype(np.float64)
        uniq = np.unique(e_prizes)
        ke = min(topk_e, len(uniq))
        top_vals = np.sort(uniq)[::-1][:ke]
        e_prizes[e_prizes < top_vals[-1]] = 0.0
        last = ke
        for j in range(ke):
            idx = e_prizes == top_vals[j]
            val = min((ke - j) / max(idx.sum(), 1), last - c)
            e_prizes[idx] = val
            last = val * (1 - c)
        cost_e = min(cost_e, float(e_prizes.max()) * (1 - c / 2))
    else:
        e_prizes = np.zeros(num_edges, np.float64)

    # virtual-node split for prize > cost edges (reference :106-128)
    costs, edges_l = [], []
    vprizes, vedges, vcosts = [], [], []
    map_e: Dict[int, int] = {}
    map_vn: Dict[int, int] = {}
    for i in range(num_edges):
        s, d = int(ei[0, i]), int(ei[1, i])
        if e_prizes[i] <= cost_e:
            map_e[len(edges_l)] = i
            edges_l.append((s, d))
            costs.append(cost_e - e_prizes[i])
        else:
            vid = num_nodes + len(vprizes)
            map_vn[vid] = i
            vedges += [(s, vid), (vid, d)]
            vcosts += [0.0, 0.0]
            vprizes.append(e_prizes[i] - cost_e)
    prizes = np.concatenate([n_prizes, np.asarray(vprizes)])
    n_real_edges = len(edges_l)
    all_edges = np.asarray(edges_l + vedges, np.int64).reshape(-1, 2)
    all_costs = np.asarray(costs + vcosts, np.float64)

    vertices, sel = _pcst_approx(all_edges, prizes, all_costs,
                                 num_clusters)
    selected_nodes = vertices[vertices < num_nodes]
    selected_edges = [map_e[int(i)] for i in sel if i < n_real_edges]
    virtual = vertices[vertices >= num_nodes]
    if len(virtual):
        selected_edges += [map_vn[int(i)] for i in virtual]
    selected_edges = np.asarray(sorted(set(selected_edges)), np.int64)

    sub_ei = ei[:, selected_edges] if len(selected_edges) else \
        np.zeros((2, 0), np.int64)
    selected_nodes = np.unique(np.concatenate(
        [selected_nodes, sub_ei[0], sub_ei[1]])).astype(np.int64)

    nrows = textual_nodes.iloc[selected_nodes]
    erows = textual_edges.iloc[selected_edges]
    desc = nrows.to_csv(index=False) + '\n' + erows.to_csv(
        index=False, columns=['src', 'edge_attr', 'dst'])

    mapping = {int(nd): i for i, nd in enumerate(selected_nodes)}
    src = np.asarray([mapping[int(i)] for i in sub_ei[0]], np.int64)
    dst = np.asarray([mapping[int(i)] for i in sub_ei[1]], np.int64)
    node_idx = np.asarray(data.node_idx)[selected_nodes] \
        if _get(data, 'node_idx') is not None else selected_nodes
    edge_idx = np.asarray(data.edge_idx)[selected_edges] \
        if _get(data, 'edge_idx') is not None else selected_edges
    out = Data(x=x[selected_nodes],
               edge_index=np.stack([src, dst]) if len(src) else
               np.zeros((2, 0), np.int64),
               edge_attr=ea[selected_edges],
               num_nodes=len(selected_nodes))
    return out.replace(node_idx=node_idx, edge_idx=edge_idx), desc


# ---------------------------------------------------------------------------
# backend construction
# ---------------------------------------------------------------------------


def create_graph_from_triples(
    triples: Iterable[TripletLike],
    embedding_model: Callable,
    embedding_method_kwargs: Optional[Dict[str, Any]] = None,
    pre_transform: Optional[Callable[[TripletLike],
                                     TripletLike]] = None,
) -> Data:
    """Triples -> indexed Data with node/edge embeddings (reference
    ``backend_utils.py:292``)."""
    kwargs = embedding_method_kwargs or {}
    encode = getattr(embedding_model, 'encode', embedding_model)
    indexer = LargeGraphIndexer.from_triplets(
        triples, pre_transform=pre_transform)
    indexer.add_node_feature(
        'x', np.asarray(encode(indexer.get_unique_node_features(),
                               **kwargs)))
    indexer.add_edge_feature(
        'edge_attr',
        np.asarray(encode(
            indexer.get_unique_edge_features(EDGE_RELATION),
            **kwargs)),
        map_from_feature=EDGE_RELATION)
    return indexer.to_data('x', 'edge_attr')


class RemoteDataType(Enum):
    DATA = auto()
    PARTITION = auto()


@dataclass
class RemoteGraphBackendLoader:
    """Deferred (feature_store, graph_store) constructor (reference
    ``backend_utils.py:258``)."""
    path: str
    datatype: RemoteDataType
    graph_store_type: Type
    feature_store_type: Type

    def load(self, pid: Optional[int] = None):
        if self.datatype == RemoteDataType.DATA:
            import pickle
            with open(self.path, 'rb') as f:
                payload = pickle.load(f)
            fstore = self.feature_store_type()
            fstore.put_tensor(payload['x'], 'node', 'x')
            if payload.get('edge_attr') is not None:
                fstore.put_tensor(payload['edge_attr'], 'edge',
                                  'edge_attr')
            gstore = self.graph_store_type()
            gstore.edge_index = payload['edge_index']
            return fstore, gstore
        if self.datatype == RemoteDataType.PARTITION:
            assert pid is not None, \
                'Partition ID must be defined for loading from a ' \
                'partitioned store.'
            fstore = self.feature_store_type.from_partition(
                self.path, pid)
            gstore = self.graph_store_type.from_partition(
                self.path, pid)
            return fstore, gstore
        raise NotImplementedError

    def __del__(self):
        if self.datatype == RemoteDataType.DATA and \
                os.path.isfile(self.path):
            os.remove(self.path)


def create_remote_backend_from_graph_data(
    graph_data: Data,
    graph_db: Optional[Type] = None,
    feature_db: Optional[Type] = None,
    path: str = '', n_parts: int = 1,
) -> RemoteGraphBackendLoader:
    """Persist graph data (single pickle or partition dirs) behind a
    loader (reference ``backend_utils.py:322``). Defaults to the RAG
    stores; ``n_parts > 1`` routes through the distributed
    Partitioner."""
    from .stores import (KNNRAGFeatureStore,
                         NeighborSamplingRAGGraphStore)
    if n_parts > 1:
        # partition persistence needs from_partition constructors —
        # default to the distributed local stores (the reference's
        # defaults, ``backend_utils.py:322``)
        from ..distributed import LocalFeatureStore, LocalGraphStore
        graph_db = graph_db or LocalGraphStore
        feature_db = feature_db or LocalFeatureStore
        for db in (graph_db, feature_db):
            if not hasattr(db, 'from_partition'):
                raise TypeError(
                    f'{db.__name__} has no from_partition; n_parts > 1 '
                    f'requires partition-loadable stores (e.g. '
                    f'distributed.LocalFeatureStore/LocalGraphStore)')
    else:
        graph_db = graph_db or NeighborSamplingRAGGraphStore
        feature_db = feature_db or KNNRAGFeatureStore
    if n_parts == 1:
        import pickle
        payload = {
            'x': np.asarray(graph_data.x),
            'edge_index': np.asarray(graph_data.edge_index),
            'edge_attr': (np.asarray(graph_data.edge_attr)
                          if _get(graph_data, 'edge_attr') is not None
                          else None),
        }
        with open(path, 'wb') as f:
            pickle.dump(payload, f)
        return RemoteGraphBackendLoader(path, RemoteDataType.DATA,
                                        graph_db, feature_db)
    from ..distributed import Partitioner
    Partitioner(graph_data, num_parts=n_parts,
                root=path).generate_partition()
    return RemoteGraphBackendLoader(path, RemoteDataType.PARTITION,
                                    graph_db, feature_db)


def make_pcst_filter(triples: List[TripletLike], model,
                     topk: int = 5, topk_e: int = 5,
                     cost_e: float = 0.5, num_clusters: int = 1,
                     pre_transform: Optional[Callable] = None
                     ) -> Callable[[Data, str], Data]:
    """``subgraph_filter`` for :class:`~.stores.RAGQueryLoader`:
    PCST-prune the retrieved subgraph around the query and attach the
    textualised description (reference ``backend_utils.py:367``).

    Pass the SAME ``pre_transform`` that built the backend
    (:func:`create_graph_from_triples`) — edge ids index the
    deduplicated post-transform triple list, so a mismatched
    normalisation would misalign every edge's text."""
    from pandas import DataFrame
    if pre_transform is not None:
        triples = [tuple(pre_transform(tuple(t))) for t in triples]
    triples = list(dict.fromkeys(tuple(t) for t in triples))
    nodes: List[str] = []
    for h, _, t in triples:
        nodes.append(h)
        nodes.append(t)
    full_textual_nodes = list(dict.fromkeys(nodes))

    def apply_retrieval_via_pcst(graph: Data, query: str) -> Data:
        q_emb = np.asarray(model.encode([query]))[0]
        node_idx = np.asarray(graph.node_idx)
        edge_idx = np.asarray(graph.edge_idx)
        textual_nodes = DataFrame(
            [(int(i), full_textual_nodes[int(i)]) for i in node_idx],
            columns=['node_id', 'node_attr'])
        textual_edges = DataFrame([triples[int(i)] for i in edge_idx],
                                  columns=['src', 'edge_attr', 'dst'])
        out, desc = retrieval_via_pcst(
            graph, q_emb, textual_nodes, textual_edges, topk=topk,
            topk_e=topk_e, cost_e=cost_e, num_clusters=num_clusters)
        # parse the csv tail properly (pandas quotes fields that
        # contain commas — a naive split would mangle them)
        import csv as _csv
        import io as _io
        where = desc.find('src,edge_attr,dst')
        parsed = [tuple(row) for row in _csv.reader(
            _io.StringIO(desc[where:])) if row][1:]
        ok = parsed and parsed != [('',)] and \
            np.asarray(_get(out, 'edge_index')).size > 0
        out = out.replace(question=np.frombuffer(
            query.encode()[:128].ljust(128), np.uint8).copy())
        out._store['desc'] = desc
        out._store['triples'] = parsed if ok else []
        return out

    return apply_retrieval_via_pcst
