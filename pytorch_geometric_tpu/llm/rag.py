"""Graph-RAG storage: the large-graph triplet indexer.

Reference: ``torch_geometric/llm/large_graph_indexer.py:73`` — a
catalogue of unique nodes and ``(head, relation, tail)`` edges with
ORDERED attribute maps, so features computed once (e.g. sentence
embeddings of node text) can be joined back onto any sampled subgraph
by id. The TPU build keeps the same data model but stores dense
features as numpy arrays (device transfer happens at query time,
batched) and persists with ``np.save``/pickle instead of
``torch.save``.

The retrieval stores that consume this index live in
``llm/stores.py`` (:class:`KNNRAGFeatureStore`,
:class:`NeighborSamplingRAGGraphStore`, :class:`RAGQueryLoader`).
"""

import os
import pickle
import shutil
from dataclasses import dataclass
from itertools import chain
from typing import (Any, Callable, Dict, Iterable, Iterator, List,
                    Optional, Sequence, Set, Tuple, Union)

import numpy as np

from ..data.data import Data

TripletLike = Tuple[str, str, str]
KnowledgeGraphLike = Iterable[TripletLike]


def ordered_set(values: Iterable) -> List:
    """Unique values preserving first-seen order (reference
    ``large_graph_indexer.py:34``)."""
    return list(dict.fromkeys(values))


# canonical attribute keys (reference ``large_graph_indexer.py:40-50``)
NODE_PID = 'pid'
NODE_KEYS = {NODE_PID}
EDGE_PID = 'e_pid'
EDGE_HEAD = 'h'
EDGE_RELATION = 'r'
EDGE_TAIL = 't'
EDGE_INDEX = 'edge_idx'
EDGE_KEYS = {EDGE_PID, EDGE_HEAD, EDGE_RELATION, EDGE_TAIL, EDGE_INDEX}

FeatureValueType = Union[Sequence[Any], np.ndarray]


@dataclass
class MappedFeature:
    """A feature keyed by the unique values of ANOTHER feature (e.g.
    one embedding per unique relation string) instead of per
    node/edge (reference ``large_graph_indexer.py:56``)."""
    name: str
    values: FeatureValueType

    def __eq__(self, other: 'MappedFeature') -> bool:
        if not isinstance(other, MappedFeature) or \
                self.name != other.name:
            return False
        if isinstance(self.values, np.ndarray) or \
                isinstance(other.values, np.ndarray):
            return bool(np.array_equal(np.asarray(self.values),
                                       np.asarray(other.values)))
        return self.values == other.values


def _vals_equal(a, b):
    if type(a) is not type(b) and not (
            isinstance(a, np.ndarray) and isinstance(b, np.ndarray)):
        return False
    if isinstance(a, np.ndarray):
        return bool(np.array_equal(a, b))
    return a == b


class LargeGraphIndexer:
    """Unique-id catalogue of a knowledge graph with ordered node/edge
    attribute maps (reference ``large_graph_indexer.py:73``)."""

    def __init__(self, nodes: Iterable[str], edges: KnowledgeGraphLike,
                 node_attr: Optional[Dict[str, List[Any]]] = None,
                 edge_attr: Optional[Dict[str, List[Any]]] = None):
        nodes = list(nodes)
        edges = [tuple(e) for e in edges]
        if len(nodes) != len(set(nodes)):
            raise AttributeError('Nodes need to be unique')
        if len(edges) != len(set(edges)):
            raise AttributeError('Edges need to be unique')

        self._nodes: Dict[str, int] = {}
        self._edges: Dict[TripletLike, int] = {}
        self._mapped_node_features: Set[str] = set()
        self._mapped_edge_features: Set[str] = set()

        if node_attr is not None:
            self.node_attr = dict(node_attr)
            if NODE_KEYS - set(self.node_attr) :
                raise AttributeError(
                    'Invalid node_attr object. Missing '
                    f'{NODE_KEYS - set(self.node_attr)}')
            if list(self.node_attr[NODE_PID]) != nodes:
                raise AttributeError(
                    'Nodes provided do not match those in node_attr')
        else:
            self.node_attr = {NODE_PID: nodes}
        for i, node in enumerate(self.node_attr[NODE_PID]):
            self._nodes[node] = i

        if edge_attr is not None:
            self.edge_attr = dict(edge_attr)
            if EDGE_KEYS - set(self.edge_attr):
                raise AttributeError(
                    'Invalid edge_attr object. Missing '
                    f'{EDGE_KEYS - set(self.edge_attr)}')
            if [tuple(e) for e in self.edge_attr[EDGE_PID]] != edges:
                raise AttributeError(
                    'Edges provided do not match those in edge_attr')
        else:
            self.edge_attr = {k: [] for k in EDGE_KEYS}
            self.edge_attr[EDGE_PID] = edges
            for h, r, t in edges:
                self.edge_attr[EDGE_HEAD].append(h)
                self.edge_attr[EDGE_RELATION].append(r)
                self.edge_attr[EDGE_TAIL].append(t)
                self.edge_attr[EDGE_INDEX].append(
                    (self._nodes[h], self._nodes[t]))
        for i, tup in enumerate(edges):
            self._edges[tup] = i

    # -- construction -------------------------------------------------------
    @classmethod
    def from_triplets(
        cls, triplets: KnowledgeGraphLike,
        pre_transform: Optional[Callable[[TripletLike],
                                         TripletLike]] = None,
    ) -> 'LargeGraphIndexer':
        """Index a stream of ``(head, rel, tail)`` triplets (reference
        ``large_graph_indexer.py:155``)."""
        if pre_transform is not None:
            triplets = [tuple(pre_transform(tuple(t))) for t in triplets]
        else:
            triplets = [tuple(t) for t in triplets]
        nodes = []
        for h, _, t in triplets:
            nodes.append(h)
            nodes.append(t)
        return cls(ordered_set(nodes), ordered_set(triplets))

    @classmethod
    def collate(cls, graphs: Iterable['LargeGraphIndexer']
                ) -> 'LargeGraphIndexer':
        """Union of several indexes into one (reference
        ``large_graph_indexer.py:200``)."""
        trips = chain.from_iterable(g.to_triplets() for g in graphs)
        return cls.from_triplets(trips)

    def to_triplets(self) -> Iterator[TripletLike]:
        return iter(self.edge_attr[EDGE_PID])

    # -- node features ------------------------------------------------------
    def get_unique_node_features(
            self, feature_name: str = NODE_PID) -> List[str]:
        if feature_name in self._mapped_node_features:
            raise IndexError(
                'Only non-mapped features can be retrieved uniquely.')
        if feature_name not in self.node_attr:
            raise AttributeError(
                f'Nodes do not have a feature called {feature_name}')
        return ordered_set(self.get_node_features(feature_name))

    def add_node_feature(self, new_feature_name: str,
                         new_feature_vals: FeatureValueType,
                         map_from_feature: str = NODE_PID) -> None:
        """Attach one value per unique node (or per unique value of
        ``map_from_feature`` — stored as :class:`MappedFeature`;
        reference ``large_graph_indexer.py:239``)."""
        if new_feature_name in self.node_attr:
            raise AttributeError(
                'Features cannot be overridden once created')
        if map_from_feature in self._mapped_node_features:
            raise AttributeError(
                f'{map_from_feature} is already a feature mapping.')
        n_keys = len(self.get_unique_node_features(map_from_feature))
        if n_keys != len(new_feature_vals):
            raise AttributeError(
                f'Expected encodings for {n_keys} unique features, '
                f'but got {len(new_feature_vals)} encodings.')
        if map_from_feature == NODE_PID:
            self.node_attr[new_feature_name] = new_feature_vals
        else:
            self.node_attr[new_feature_name] = MappedFeature(
                name=map_from_feature, values=new_feature_vals)
            self._mapped_node_features.add(new_feature_name)

    def get_node_features(self, feature_name: str = NODE_PID,
                          pids: Optional[Iterable[str]] = None
                          ) -> Union[List[Any], np.ndarray]:
        """Feature values for the given node ids, in order (all nodes
        when ``pids`` is None; reference ``:275``). Array-valued
        features come back as one vectorized numpy take."""
        if feature_name in self._mapped_node_features:
            values = self.node_attr[feature_name].values
        else:
            values = self.node_attr.get(feature_name)
            if values is None:
                raise AttributeError(
                    f'Nodes do not have a feature called {feature_name}')
        if isinstance(values, np.ndarray):
            idx = np.fromiter(
                self.get_node_features_iter(feature_name, pids,
                                            index_only=True),
                dtype=np.int64)
            return values[idx]
        return list(self.get_node_features_iter(feature_name, pids))

    def get_node_features_iter(self, feature_name: str = NODE_PID,
                               pids: Optional[Iterable[str]] = None,
                               index_only: bool = False
                               ) -> Iterator[Any]:
        if pids is None:
            pids = self.node_attr[NODE_PID]
        if feature_name in self._mapped_node_features:
            mapped = self.node_attr[feature_name]
            uniq = self.get_unique_node_features(mapped.name)
            pos = {k: i for i, k in enumerate(uniq)}
            from_vals = self.node_attr[mapped.name]
            for pid in pids:
                j = pos[from_vals[self._nodes[pid]]]
                yield j if index_only else mapped.values[j]
        else:
            vals = self.node_attr[feature_name]
            for pid in pids:
                i = self._nodes[pid]
                yield i if index_only else vals[i]

    # -- edge features ------------------------------------------------------
    def get_unique_edge_features(
            self, feature_name: str = EDGE_PID) -> List[Any]:
        if feature_name in self._mapped_edge_features:
            raise IndexError(
                'Only non-mapped features can be retrieved uniquely.')
        if feature_name not in self.edge_attr:
            raise AttributeError(
                f'Edges do not have a feature called {feature_name}')
        return ordered_set(self.get_edge_features(feature_name))

    def add_edge_feature(self, new_feature_name: str,
                         new_feature_vals: FeatureValueType,
                         map_from_feature: str = EDGE_PID) -> None:
        if new_feature_name in self.edge_attr:
            raise AttributeError(
                'Features cannot be overridden once created')
        if map_from_feature in self._mapped_edge_features:
            raise AttributeError(
                f'{map_from_feature} is already a feature mapping.')
        n_keys = len(self.get_unique_edge_features(map_from_feature))
        if n_keys != len(new_feature_vals):
            raise AttributeError(
                f'Expected encodings for {n_keys} unique features, '
                f'but got {len(new_feature_vals)} encodings.')
        if map_from_feature == EDGE_PID:
            self.edge_attr[new_feature_name] = new_feature_vals
        else:
            self.edge_attr[new_feature_name] = MappedFeature(
                name=map_from_feature, values=new_feature_vals)
            self._mapped_edge_features.add(new_feature_name)

    def get_edge_features(self, feature_name: str = EDGE_PID,
                          pids: Optional[Iterable[Any]] = None
                          ) -> Union[List[Any], np.ndarray]:
        if feature_name in self._mapped_edge_features:
            values = self.edge_attr[feature_name].values
        else:
            values = self.edge_attr.get(feature_name)
            if values is None:
                raise AttributeError(
                    f'Edges do not have a feature called {feature_name}')
        if isinstance(values, np.ndarray):
            idx = np.fromiter(
                self.get_edge_features_iter(feature_name, pids,
                                            index_only=True),
                dtype=np.int64)
            return values[idx]
        return list(self.get_edge_features_iter(feature_name, pids))

    def get_edge_features_iter(self, feature_name: str = EDGE_PID,
                               pids: Optional[KnowledgeGraphLike] = None,
                               index_only: bool = False
                               ) -> Iterator[Any]:
        if pids is None:
            pids = self.edge_attr[EDGE_PID]
        if feature_name in self._mapped_edge_features:
            mapped = self.edge_attr[feature_name]
            uniq = self.get_unique_edge_features(mapped.name)
            pos = {k: i for i, k in enumerate(uniq)}
            from_vals = self.edge_attr[mapped.name]
            for pid in pids:
                j = pos[from_vals[self._edges[tuple(pid)]]]
                yield j if index_only else mapped.values[j]
        else:
            vals = self.edge_attr[feature_name]
            for pid in pids:
                i = self._edges[tuple(pid)]
                yield i if index_only else vals[i]

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist index + attribute maps under a directory (reference
        ``large_graph_indexer.py:469``; arrays as ``.npy``, object
        lists pickled)."""
        # only clear the files THIS class owns — never the whole
        # directory (the caller may keep unrelated outputs there)
        for sub in ('node_attr', 'edge_attr'):
            if os.path.isdir(os.path.join(path, sub)):
                shutil.rmtree(os.path.join(path, sub))
        if os.path.exists(os.path.join(path, 'ids.pkl')):
            os.remove(os.path.join(path, 'ids.pkl'))
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, 'ids.pkl'), 'wb') as f:
            pickle.dump({'nodes': self._nodes, 'edges': self._edges,
                         'mapped_nodes': self._mapped_node_features,
                         'mapped_edges': self._mapped_edge_features}, f)
        for sub, attrs in (('node_attr', self.node_attr),
                           ('edge_attr', self.edge_attr)):
            d = os.path.join(path, sub)
            os.makedirs(d, exist_ok=True)
            for name, vals in attrs.items():
                if isinstance(vals, MappedFeature) and \
                        isinstance(vals.values, np.ndarray):
                    np.save(os.path.join(d, f'{name}.mapped.npy'),
                            vals.values)
                    with open(os.path.join(d, f'{name}.mapped.pkl'),
                              'wb') as f:
                        pickle.dump(vals.name, f)
                elif isinstance(vals, np.ndarray):
                    np.save(os.path.join(d, f'{name}.npy'), vals)
                else:
                    with open(os.path.join(d, f'{name}.pkl'),
                              'wb') as f:
                        pickle.dump(vals, f)

    @classmethod
    def from_disk(cls, path: str) -> 'LargeGraphIndexer':
        indexer = cls([], [])
        with open(os.path.join(path, 'ids.pkl'), 'rb') as f:
            ids = pickle.load(f)
        indexer._nodes = ids['nodes']
        indexer._edges = ids['edges']
        indexer._mapped_node_features = ids['mapped_nodes']
        indexer._mapped_edge_features = ids['mapped_edges']
        for sub in ('node_attr', 'edge_attr'):
            attrs = getattr(indexer, sub)
            attrs.clear()
            d = os.path.join(path, sub)
            for fname in sorted(os.listdir(d)):
                full = os.path.join(d, fname)
                if fname.endswith('.mapped.npy'):
                    name = fname[:-len('.mapped.npy')]
                    with open(os.path.join(d, f'{name}.mapped.pkl'),
                              'rb') as f:
                        from_name = pickle.load(f)
                    attrs[name] = MappedFeature(from_name,
                                                np.load(full))
                elif fname.endswith('.mapped.pkl'):
                    continue
                elif fname.endswith('.npy'):
                    attrs[fname[:-4]] = np.load(full)
                else:
                    with open(full, 'rb') as f:
                        attrs[fname[:-4]] = pickle.load(f)
        return indexer

    # -- export -------------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        return len(self._nodes)

    @property
    def num_edges(self) -> int:
        return len(self._edges)

    def node_id(self, pid: str) -> int:
        return self._nodes[pid]

    def to_data(self, node_feature_name: str = NODE_PID,
                edge_feature_name: Optional[str] = None) -> Data:
        """Whole-graph :class:`Data` with the chosen features joined on
        (reference ``large_graph_indexer.py:520``)."""
        x = self.get_node_features(node_feature_name)
        numeric = isinstance(x, np.ndarray) or (
            len(x) > 0 and not isinstance(x[0], str))
        if numeric and not isinstance(x, np.ndarray):
            x = np.asarray(x, np.float32)
        ei = np.asarray(self.get_edge_features(EDGE_INDEX),
                        np.int64).reshape(-1, 2).T
        edge_attr = (self.get_edge_features(edge_feature_name)
                     if edge_feature_name is not None else None)
        ea_numeric = isinstance(edge_attr, np.ndarray)
        data = Data(x=x if numeric else None,
                    edge_index=ei,
                    edge_attr=edge_attr if ea_numeric else None,
                    num_nodes=self.num_nodes,
                    node_id=np.arange(self.num_nodes),
                    edge_id=np.arange(self.num_edges))
        # string-valued features (node/edge text) ride along raw —
        # Data's ctor jnp.asarray's kwargs, which rejects str lists
        if not numeric:
            data._store['node_text'] = list(x)
        if edge_attr is not None and not ea_numeric:
            data._store['edge_text'] = list(edge_attr)
        return data

    def __eq__(self, other: 'LargeGraphIndexer') -> bool:
        if not isinstance(other, LargeGraphIndexer):
            return False
        eq = (self._nodes == other._nodes
              and self._edges == other._edges
              and self.node_attr.keys() == other.node_attr.keys()
              and self.edge_attr.keys() == other.edge_attr.keys()
              and self._mapped_node_features
              == other._mapped_node_features
              and self._mapped_edge_features
              == other._mapped_edge_features)
        if not eq:
            return False
        for k in self.node_attr:
            if not _vals_equal(self.node_attr[k], other.node_attr[k]):
                return False
        for k in self.edge_attr:
            if not _vals_equal(self.edge_attr[k], other.edge_attr[k]):
                return False
        return True


# ---------------------------------------------------------------------------
# dataset-side feature joins
# ---------------------------------------------------------------------------


def get_features_for_triplets_groups(
    indexer: LargeGraphIndexer,
    triplet_groups: Iterable[KnowledgeGraphLike],
    node_feature_name: str = 'x',
    edge_feature_name: str = 'edge_attr',
    pre_transform: Optional[Callable[[TripletLike],
                                     TripletLike]] = None,
) -> Iterator[Data]:
    """For each triplet group, a Data holding that group's unique
    subgraph with features joined from the big index (reference
    ``large_graph_indexer.py:570``)."""
    for trips in triplet_groups:
        if pre_transform is not None:
            trips = [tuple(pre_transform(tuple(t))) for t in trips]
        else:
            trips = [tuple(t) for t in trips]
        small = LargeGraphIndexer.from_triplets(trips)
        node_keys = small.get_node_features()
        edge_keys = small.get_edge_features(pids=trips)
        eidx = np.asarray(small.get_edge_features(EDGE_INDEX, trips),
                          np.int64).reshape(-1, 2).T
        x = indexer.get_node_features(node_feature_name, node_keys)
        ea = indexer.get_edge_features(edge_feature_name, edge_keys)
        x_num = isinstance(x, np.ndarray) or (
            len(x) > 0 and not isinstance(x[0], str))
        ea_num = isinstance(ea, np.ndarray) or (
            len(ea) > 0 and not isinstance(ea[0], str))
        data = Data(x=np.asarray(x, np.float32) if x_num else None,
                    edge_attr=(np.asarray(ea, np.float32)
                               if ea_num else None),
                    edge_index=eidx,
                    num_nodes=len(node_keys))
        if not x_num:
            data._store['node_text'] = list(x)
        if not ea_num:
            data._store['edge_text'] = list(ea)
        data = data.replace(
            node_idx=np.asarray(
                [indexer._nodes[k] for k in node_keys], np.int64),
            edge_idx=np.asarray(
                [indexer._edges[tuple(e)] for e in edge_keys],
                np.int64))
        yield data


def get_features_for_triplets(
    indexer: LargeGraphIndexer,
    triplets: KnowledgeGraphLike,
    node_feature_name: str = 'x',
    edge_feature_name: str = 'edge_attr',
    pre_transform: Optional[Callable[[TripletLike],
                                     TripletLike]] = None,
) -> Data:
    """Single-group form of :func:`get_features_for_triplets_groups`
    (reference ``large_graph_indexer.py:711``)."""
    return next(get_features_for_triplets_groups(
        indexer, [triplets], node_feature_name, edge_feature_name,
        pre_transform))
