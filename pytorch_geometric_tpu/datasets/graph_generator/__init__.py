"""Class-based synthetic graph generators.

Reference: ``torch_geometric/datasets/graph_generator/`` (base.py,
ba_graph.py, er_graph.py, grid_graph.py, tree_graph.py). The numeric
construction lives in ``utils.misc`` (barabasi_albert_graph /
erdos_renyi_graph / grid); these classes add the reference's
generator-object protocol used by ``ExplainerDataset``.
"""

from abc import ABC, abstractmethod
from typing import Any, List, Optional, Tuple

import numpy as np

from ...data.data import Data


class GraphGenerator(ABC):
    """Abstract base for synthetic graph generators
    (reference ``graph_generator/base.py``)."""

    @abstractmethod
    def __call__(self) -> Data:
        raise NotImplementedError

    @staticmethod
    def resolve(query: Any, *args: Any, **kwargs: Any) -> 'GraphGenerator':
        if isinstance(query, GraphGenerator):
            return query
        if isinstance(query, type) and issubclass(query, GraphGenerator):
            return query(*args, **kwargs)
        if isinstance(query, str):
            q = query.lower()
            for gen in list(globals().values()):
                if (isinstance(gen, type)
                        and issubclass(gen, GraphGenerator)
                        and gen is not GraphGenerator):
                    name = gen.__name__.lower()
                    if q in (name, name.replace('graph', '')):
                        return gen(*args, **kwargs)
        raise ValueError(f"Could not resolve graph generator '{query}'")

    def __repr__(self) -> str:
        return f'{self.__class__.__name__}()'


class BAGraph(GraphGenerator):
    """Barabasi-Albert graphs (reference ``graph_generator/ba_graph.py``)."""

    def __init__(self, num_nodes: int, num_edges: int, seed: int = 0):
        super().__init__()
        self.num_nodes = num_nodes
        self.num_edges = num_edges
        self._seed = seed

    def __call__(self) -> Data:
        from ...utils.misc import barabasi_albert_graph
        edge_index = barabasi_albert_graph(self.num_nodes, self.num_edges,
                                           seed=self._seed)
        self._seed += 1
        return Data(num_nodes=self.num_nodes, edge_index=edge_index)

    def __repr__(self) -> str:
        return (f'{self.__class__.__name__}(num_nodes={self.num_nodes}, '
                f'num_edges={self.num_edges})')


class ERGraph(GraphGenerator):
    """Erdos-Renyi graphs (reference ``graph_generator/er_graph.py``)."""

    def __init__(self, num_nodes: int, edge_prob: float, seed: int = 0):
        super().__init__()
        self.num_nodes = num_nodes
        self.edge_prob = edge_prob
        self._seed = seed

    def __call__(self) -> Data:
        from ...utils.misc import erdos_renyi_graph
        edge_index = erdos_renyi_graph(self.num_nodes, self.edge_prob,
                                       seed=self._seed)
        self._seed += 1
        return Data(num_nodes=self.num_nodes, edge_index=edge_index)

    def __repr__(self) -> str:
        return (f'{self.__class__.__name__}(num_nodes={self.num_nodes}, '
                f'edge_prob={self.edge_prob})')


class GridGraph(GraphGenerator):
    """2-D grid graphs (reference ``graph_generator/grid_graph.py``)."""

    def __init__(self, height: int, width: int, dtype=None):
        super().__init__()
        self.height = height
        self.width = width
        self.dtype = dtype

    def __call__(self) -> Data:
        from ...utils.misc import grid
        edge_index, pos = grid(self.height, self.width)
        if self.dtype is not None:
            pos = pos.astype(self.dtype)
        return Data(edge_index=edge_index, pos=pos)

    def __repr__(self) -> str:
        return (f'{self.__class__.__name__}(height={self.height}, '
                f'width={self.width})')


def tree(depth: int, branch: int = 2, undirected: bool = False
         ) -> Tuple[np.ndarray, np.ndarray]:
    """Perfect ``branch``-ary tree edges (parent->child, BFS ids) plus
    per-node depth (reference ``graph_generator/tree_graph.py::tree``)."""
    edges: List[Tuple[int, int]] = []
    depths: List[int] = [0]
    frontier = [0]
    for d in range(depth):
        nxt = []
        for node in frontier:
            for _ in range(branch):
                child = len(depths)
                edges.append((node, child))
                depths.append(d + 1)
                nxt.append(child)
        frontier = nxt
    edge_index = np.asarray(edges, np.int64).T.reshape(2, -1)
    if undirected:
        from ...utils.coalesce import to_undirected
        edge_index = to_undirected(edge_index, num_nodes=len(depths))
    return edge_index, np.asarray(depths, np.int64)


class TreeGraph(GraphGenerator):
    """Perfect trees (reference ``graph_generator/tree_graph.py``).

    Note: the reference emits edges in DFS insertion order but BFS node
    ids; edge *sets* match (ids are BFS in both), only edge order
    differs, which no consumer depends on.
    """

    def __init__(self, depth: int, branch: int = 2,
                 undirected: bool = False):
        super().__init__()
        self.depth = depth
        self.branch = branch
        self.undirected = undirected

    def __call__(self) -> Data:
        edge_index, depths = tree(self.depth, self.branch, self.undirected)
        return Data(edge_index=edge_index, depth=depths,
                    num_nodes=len(depths))

    def __repr__(self) -> str:
        return (f'{self.__class__.__name__}(depth={self.depth}, '
                f'branch={self.branch}, undirected={self.undirected})')


__all__ = ['GraphGenerator', 'BAGraph', 'ERGraph', 'GridGraph', 'TreeGraph']
