"""HypergraphData (reference ``torch_geometric/data/hypergraph_data.py``):
a Data whose ``edge_index`` is a [2, nnz] (node, hyperedge) incidence."""

from typing import Optional

import jax
import numpy as np

from .data import Data


@jax.tree_util.register_pytree_node_class
class HypergraphData(Data):
    def __init__(self, x=None, edge_index=None,
                 num_hyperedges: Optional[int] = None, **kwargs):
        super().__init__(x=x, edge_index=edge_index, **kwargs)
        self._num_hyperedges = num_hyperedges

    @property
    def num_hyperedges(self) -> Optional[int]:
        if self._num_hyperedges is not None:
            return self._num_hyperedges
        ei = self._store.get('edge_index')
        if ei is None:
            return 0
        coo = np.asarray(ei.coo if hasattr(ei, 'coo') else ei)
        return int(coo[1].max()) + 1 if coo.size else 0

    def tree_flatten(self):
        children, (keys, num_nodes) = super().tree_flatten()
        return children, (keys, num_nodes, self._num_hyperedges)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, num_nodes, num_he = aux
        obj = object.__new__(cls)
        obj._store = dict(zip(keys, children))
        obj._num_nodes = num_nodes
        obj._num_hyperedges = num_he
        return obj
