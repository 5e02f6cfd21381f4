"""Data — the homogeneous graph container (pytree).

TPU-native redesign of reference ``torch_geometric/data/data.py:472``.
The reference is a mutable attribute-dict with batching rules
(``__cat_dim__``/``__inc__``); here Data is an immutable pytree of named
arrays plus static metadata (num_nodes/num_edges), so a whole graph can be
passed through ``jit``/``pjit`` and sharded like any other pytree.

Batching rules are kept as *conventions on key names* (same as the
reference's defaults, ``data.py:114-127``):
  * keys containing 'index' or named 'adj' increment by num_nodes and
    concatenate on the edge dim;
  * 'face' increments by num_nodes, concatenated on dim 1;
  * everything else concatenates on dim 0 with no increment.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..edge_index import EdgeIndex

# Keys treated as static (non-traced) metadata.
_STATIC_KEYS = ('num_nodes', 'num_edges')


@jax.tree_util.register_pytree_node_class
class Data:
    """A graph: named arrays + static sizes.

    Usage mirrors the reference::

        data = Data(x=x, edge_index=edge_index, y=y, num_nodes=N)
        data.x, data.edge_index, data.num_nodes
        data = data.replace(x=new_x)
    """

    def __init__(self, x=None, edge_index=None, edge_attr=None, y=None,
                 pos=None, num_nodes: Optional[int] = None, **kwargs):
        store: Dict[str, Any] = {}
        if x is not None:
            store['x'] = jnp.asarray(x)
        if edge_index is not None:
            if not isinstance(edge_index, EdgeIndex):
                edge_index = jnp.asarray(edge_index)
            store['edge_index'] = edge_index
        if edge_attr is not None:
            store['edge_attr'] = jnp.asarray(edge_attr)
        if y is not None:
            store['y'] = jnp.asarray(y)
        if pos is not None:
            store['pos'] = jnp.asarray(pos)
        for k, v in kwargs.items():
            if v is None:
                continue
            store[k] = v if isinstance(v, (EdgeIndex,)) else jnp.asarray(v)
        self._store = store
        self._num_nodes = num_nodes

    # -- pytree -------------------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self._store.keys())
        children = tuple(self._store[k] for k in keys)
        return children, (tuple(keys), self._num_nodes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, num_nodes = aux
        obj = object.__new__(cls)
        obj._store = dict(zip(keys, children))
        obj._num_nodes = num_nodes
        return obj

    # -- attribute access ----------------------------------------------------
    def __getattr__(self, key: str):
        if key.startswith('_'):
            raise AttributeError(key)
        store = object.__getattribute__(self, '_store')
        if key in store:
            return store[key]
        return None

    def __setattr__(self, key: str, value):
        # private fields and properties (num_nodes) use normal attribute
        # mechanics; everything else lands in the store so batching,
        # pytree flattening and __getitem__ all see it
        if key.startswith('_') or isinstance(
                getattr(type(self), key, None), property):
            object.__setattr__(self, key, value)
            return
        store = object.__getattribute__(self, '_store')
        if value is None:
            store.pop(key, None)
            return
        if isinstance(value, EdgeIndex):
            store[key] = value
            return
        try:
            store[key] = jnp.asarray(value)
        except (TypeError, ValueError):
            store[key] = value   # non-array payloads (strings, objects)

    def __getitem__(self, key: str):
        return self._store.get(key)

    def __setitem__(self, key: str, value):
        setattr(self, key, value)

    def __delitem__(self, key: str):
        self._store.pop(key, None)

    def __contains__(self, key: str) -> bool:
        return key in self._store

    def keys(self):
        return list(self._store.keys())

    def items(self):
        return self._store.items()

    def replace(self, **kwargs) -> 'Data':
        """Functional update (returns a new Data)."""
        new = dict(self._store)
        num_nodes = kwargs.pop('num_nodes', self._num_nodes)
        for k, v in kwargs.items():
            if v is None:
                new.pop(k, None)
            elif isinstance(v, (EdgeIndex,)) or hasattr(v, 'dtype'):
                new[k] = v if isinstance(v, EdgeIndex) else jnp.asarray(v)
            else:
                new[k] = v
        obj = object.__new__(Data)
        obj._store = new
        obj._num_nodes = num_nodes
        return obj

    # -- sizes (reference data.py:170 num_nodes inference) -------------------
    @property
    def num_nodes(self) -> Optional[int]:
        if self._num_nodes is not None:
            return self._num_nodes
        x = self._store.get('x')
        if x is not None:
            return int(x.shape[0])
        pos = self._store.get('pos')
        if pos is not None:
            return int(pos.shape[0])
        ei = self._store.get('edge_index')
        if isinstance(ei, EdgeIndex):
            return ei.num_src_nodes
        if ei is not None and ei.size:
            return int(np.asarray(ei).max()) + 1
        return None

    @num_nodes.setter
    def num_nodes(self, value):
        self._num_nodes = None if value is None else int(value)

    @property
    def num_edges(self) -> int:
        ei = self._store.get('edge_index')
        if ei is None:
            return 0
        if isinstance(ei, EdgeIndex):
            return ei.num_edges
        return int(ei.shape[1])

    @property
    def num_node_features(self) -> int:
        x = self._store.get('x')
        return 0 if x is None or x.ndim < 2 else int(x.shape[-1])

    num_features = num_node_features

    @property
    def num_edge_features(self) -> int:
        ea = self._store.get('edge_attr')
        return 0 if ea is None or ea.ndim < 2 else int(ea.shape[-1])

    def __repr__(self):
        parts = []
        for k, v in sorted(self._store.items()):
            if hasattr(v, 'shape'):
                parts.append(f"{k}={list(v.shape)}")
            else:
                parts.append(f"{k}={v}")
        return f"Data({', '.join(parts)})"

    # -- batching rules (reference data.py:114-127) ---------------------------
    @staticmethod
    def cat_dim(key: str, value) -> int:
        if isinstance(value, EdgeIndex) or 'index' in key or key == 'face':
            return 1 if (getattr(value, 'ndim', 2) == 2
                         or isinstance(value, EdgeIndex)) else 0
        return 0

    def inc(self, key: str, value) -> int:
        if isinstance(value, EdgeIndex) or 'index' in key or key == 'face':
            return self.num_nodes or 0
        return 0
