"""HeteroData — typed graph container (pytree).

Reference: ``torch_geometric/data/hetero_data.py:43`` (1318 LoC). Typed
node stores keyed by node-type string; typed edge stores keyed by
``(src, rel, dst)`` tuples; ``metadata()`` returns (node_types,
edge_types). Immutable pytree: per-type dicts of named arrays plus static
per-type sizes, so a whole hetero graph jits/shards as one pytree.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import Data
from ..edge_index import EdgeIndex

EdgeType = Tuple[str, str, str]


class _Store:
    """Attribute-dict view over a dict (node or edge store)."""

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, '_d', data)

    def __getattr__(self, key):
        d = object.__getattribute__(self, '_d')
        if key in d:
            return d[key]
        if key == 'num_nodes':
            x = d.get('x')
            return None if x is None else int(x.shape[0])
        if key == 'num_edges':
            ei = d.get('edge_index')
            if ei is None:
                return 0
            coo = ei.coo if isinstance(ei, EdgeIndex) else ei
            return int(coo.shape[1])
        return None

    def __setattr__(self, key, value):
        object.__getattribute__(self, '_d')[key] = (
            value if isinstance(value, EdgeIndex) else jnp.asarray(value))

    def __contains__(self, key):
        return key in object.__getattribute__(self, '_d')

    def get(self, key, default=None):
        return object.__getattribute__(self, '_d').get(key, default)

    def keys(self):
        return object.__getattribute__(self, '_d').keys()

    def items(self):
        return object.__getattribute__(self, '_d').items()


@jax.tree_util.register_pytree_node_class
class HeteroData:
    """Typed graph: ``data['paper'].x``, ``data['paper','cites','paper']``.

    Usage mirrors the reference::

        data = HeteroData()
        data['paper'].x = x
        data['paper', 'cites', 'paper'].edge_index = ei
        data.metadata()  ->  (['paper'], [('paper','cites','paper')])
    """

    def __init__(self):
        object.__setattr__(self, '_node', {})
        object.__setattr__(self, '_edge', {})
        object.__setattr__(self, '_global', {})

    # graph-level attributes (``data.y = ...``) live in a global store so
    # they participate in collation (reference ``hetero_data.py`` BaseStorage
    # global store).
    def __setattr__(self, key, value):
        if key.startswith('_'):
            object.__setattr__(self, key, value)
        else:
            self._global[key] = value

    def __getattr__(self, key):
        if key.startswith('_'):
            raise AttributeError(key)
        g = object.__getattribute__(self, '_global')
        if key in g:
            return g[key]
        raise AttributeError(key)

    # -- store access -------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return _Store(self._node.setdefault(key, {}))
        key = tuple(key)
        if len(key) == 2:
            key = (key[0], 'to', key[1])
        return _Store(self._edge.setdefault(key, {}))

    @property
    def node_types(self) -> List[str]:
        return list(self._node.keys())

    @property
    def edge_types(self) -> List[EdgeType]:
        return list(self._edge.keys())

    def metadata(self) -> Tuple[List[str], List[EdgeType]]:
        return self.node_types, self.edge_types

    @property
    def x_dict(self) -> Dict[str, jnp.ndarray]:
        return {t: s.get('x') for t, s in self._node.items()
                if 'x' in s}

    @property
    def edge_index_dict(self) -> Dict[EdgeType, Any]:
        return {t: s.get('edge_index') for t, s in self._edge.items()
                if 'edge_index' in s}

    def collect(self, key: str) -> Dict:
        out = {}
        for t, s in self._node.items():
            if key in s:
                out[t] = s[key]
        for t, s in self._edge.items():
            if key in s:
                out[t] = s[key]
        return out

    def num_nodes_dict(self) -> Dict[str, int]:
        return {t: _Store(s).num_nodes for t, s in self._node.items()}

    # -- pytree -------------------------------------------------------------
    def tree_flatten(self):
        nkeys = sorted(self._node.keys())
        ekeys = sorted(self._edge.keys())
        children = []
        schema = []
        for t in nkeys:
            ks = sorted(self._node[t].keys())
            schema.append((t, tuple(ks)))
            children.extend(self._node[t][k] for k in ks)
        eschema = []
        for t in ekeys:
            ks = sorted(self._edge[t].keys())
            eschema.append((t, tuple(ks)))
            children.extend(self._edge[t][k] for k in ks)
        gkeys = tuple(sorted(self._global.keys()))
        children.extend(self._global[k] for k in gkeys)
        return tuple(children), (tuple(schema), tuple(eschema), gkeys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        schema, eschema, gkeys = aux
        obj = object.__new__(cls)
        object.__setattr__(obj, '_node', {})
        object.__setattr__(obj, '_edge', {})
        object.__setattr__(obj, '_global', {})
        it = iter(children)
        for t, ks in schema:
            obj._node[t] = {k: next(it) for k in ks}
        for t, ks in eschema:
            obj._edge[t] = {k: next(it) for k in ks}
        for k in gkeys:
            obj._global[k] = next(it)
        return obj

    # -- conversions (reference hetero_data.py:to_homogeneous) ---------------
    def to_homogeneous(self, node_attrs=('x',), add_node_type: bool = True,
                       add_edge_type: bool = True) -> Data:
        ntypes = self.node_types
        offsets, cursor = {}, 0
        xs, tvec = [], []
        for i, t in enumerate(ntypes):
            s = _Store(self._node[t])
            n = s.num_nodes
            offsets[t] = cursor
            cursor += n
            if 'x' in self._node[t]:
                xs.append(self._node[t]['x'])
            tvec.append(np.full(n, i, np.int32))
        coos, evec = [], []
        for j, (src, rel, dst) in enumerate(self.edge_types):
            ei = self._edge[(src, rel, dst)]['edge_index']
            coo = np.asarray(ei.coo if isinstance(ei, EdgeIndex) else ei)
            coo = coo + np.array([[offsets[src]], [offsets[dst]]])
            coos.append(coo)
            evec.append(np.full(coo.shape[1], j, np.int32))
        kwargs = {}
        # Only concat features when every type has them with matching dims
        # (reference to_homogeneous skips mismatched attributes).
        if (xs and len(xs) == len(ntypes)
                and len({int(x.shape[-1]) for x in xs}) == 1):
            kwargs['x'] = jnp.concatenate(xs, 0)
        if add_node_type:
            kwargs['node_type'] = jnp.asarray(np.concatenate(tvec))
        if add_edge_type and evec:
            kwargs['edge_type'] = jnp.asarray(np.concatenate(evec))
        ei = (jnp.asarray(np.concatenate(coos, 1)) if coos else None)
        return Data(edge_index=ei, num_nodes=cursor, **kwargs)
