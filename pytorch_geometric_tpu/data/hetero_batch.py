"""Hetero-graph batching (reference ``data/batch.py`` +
``data/collate.py`` hetero path: collation iterates typed stores and
offsets each edge type by its endpoint types' cumulative node counts).

Same padding-first design as homogeneous ``Batch``: per-node-type and
per-edge-type static budgets so consecutive hetero batches share one
compiled program. Padded edges point both endpoints at the padded node
count (dropped by segment ops); padded nodes carry a dump batch id.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hetero_data import HeteroData, _Store
from ..edge_index import EdgeIndex

EdgeType = Tuple[str, str, str]


@jax.tree_util.register_pytree_node_class
class HeteroBatch(HeteroData):
    """Disjoint union of HeteroData graphs; ``batch['paper'].batch`` is
    the per-type graph-assignment vector, ``batch['paper'].ptr`` the
    cumulative node counts."""

    @classmethod
    def from_hetero_list(cls, data_list: Sequence[HeteroData],
                         pad_num_nodes: Optional[Dict[str, int]] = None,
                         pad_num_edges: Optional[Dict[EdgeType, int]] = None
                         ) -> 'HeteroBatch':
        if len(data_list) == 0:
            raise ValueError('Cannot batch an empty list')
        node_types = data_list[0].node_types
        edge_types = data_list[0].edge_types
        for d in data_list[1:]:
            if d.node_types != node_types or d.edge_types != edge_types:
                raise ValueError('All graphs must share metadata')

        obj = object.__new__(cls)
        object.__setattr__(obj, '_node', {})
        object.__setattr__(obj, '_edge', {})
        object.__setattr__(obj, '_global', {})
        obj._num_graphs = len(data_list)
        obj._num_real = {}

        # graph-level attributes stack along a new leading graph axis
        gkeys = set()
        for d in data_list:
            gkeys |= set(d._global.keys())
        for k in gkeys:
            vals = [np.asarray(d._global[k]) for d in data_list]
            obj._global[k] = jnp.asarray(np.stack(vals, 0))

        counts: Dict[str, List[int]] = {}
        offsets: Dict[str, np.ndarray] = {}
        for t in node_types:
            counts[t] = [d[t].num_nodes or 0 for d in data_list]
            offsets[t] = np.cumsum([0] + counts[t])
            total = int(offsets[t][-1])
            pad = (pad_num_nodes or {}).get(t, total)
            if pad < total:
                raise ValueError(f"node budget for '{t}' too small: "
                                 f'need {total}, got {pad}')
            store: Dict[str, jnp.ndarray] = {}
            keys = set()
            for d in data_list:
                keys |= set(d[t].keys())
            for k in keys:
                vals = [np.asarray(d[t].get(k)) for d in data_list]
                cat = np.concatenate(vals, 0)
                if cat.shape[0] == total and pad > total:
                    z = np.zeros((pad - total,) + cat.shape[1:], cat.dtype)
                    cat = np.concatenate([cat, z], 0)
                store[k] = jnp.asarray(cat)
            bvec = np.repeat(np.arange(len(data_list)), counts[t])
            if pad > total:
                bvec = np.concatenate(
                    [bvec, np.full(pad - total, len(data_list))])
            store['batch'] = jnp.asarray(bvec.astype(np.int32))
            store['ptr'] = jnp.asarray(offsets[t].astype(np.int32))
            obj._node[t] = store
            obj._num_real[t] = total

        for et in edge_types:
            src_t, _, dst_t = et
            ecounts = [d[et].num_edges for d in data_list]
            total_e = int(sum(ecounts))
            pad_e = (pad_num_edges or {}).get(et, total_e)
            if pad_e < total_e:
                raise ValueError(f"edge budget for {et} too small: "
                                 f'need {total_e}, got {pad_e}')
            n_src = (pad_num_nodes or {}).get(
                src_t, int(offsets[src_t][-1]))
            n_dst = (pad_num_nodes or {}).get(
                dst_t, int(offsets[dst_t][-1]))
            store = {}
            keys = set()
            for d in data_list:
                keys |= set(d[et].keys())
            for k in keys:
                if k == 'edge_index':
                    coos = []
                    for i, d in enumerate(data_list):
                        ei = d[et].edge_index
                        coo = np.asarray(ei.coo if isinstance(ei, EdgeIndex)
                                         else ei)
                        coos.append(coo + np.array(
                            [[offsets[src_t][i]], [offsets[dst_t][i]]]))
                    cat = (np.concatenate(coos, 1) if coos
                           else np.zeros((2, 0), np.int64))
                    if pad_e > total_e:
                        fill = np.array([[n_src], [n_dst]], cat.dtype)
                        cat = np.concatenate(
                            [cat, np.repeat(fill, pad_e - total_e, 1)], 1)
                    store[k] = EdgeIndex(jnp.asarray(cat), (n_src, n_dst),
                                         num_real_edges=total_e)
                else:
                    vals = [np.asarray(d[et].get(k)) for d in data_list]
                    cat = np.concatenate(vals, 0)
                    if cat.shape[0] == total_e and pad_e > total_e:
                        z = np.zeros((pad_e - total_e,) + cat.shape[1:],
                                     cat.dtype)
                        cat = np.concatenate([cat, z], 0)
                    store[k] = jnp.asarray(cat)
            store['edge_mask'] = jnp.arange(pad_e) < total_e
            obj._edge[et] = store
            obj._num_real[et] = total_e
        return obj

    @property
    def num_graphs(self) -> int:
        return self._num_graphs

    def node_mask_dict(self) -> Dict[str, jnp.ndarray]:
        """Per-type validity masks over (possibly padded) rows."""
        out = {}
        for t, s in self._node.items():
            n = _Store(s).num_nodes
            out[t] = jnp.arange(n) < self._num_real[t]
        return out

    def to_hetero_list(self) -> List[HeteroData]:
        """Split back into individual graphs (host-side)."""
        out = []
        for g in range(self._num_graphs):
            h = HeteroData()
            for k, v in self._global.items():
                setattr(h, k, np.asarray(v)[g])
            for t, s in self._node.items():
                ptr = np.asarray(s['ptr'])
                lo, hi = int(ptr[g]), int(ptr[g + 1])
                for k, v in s.items():
                    if k in ('batch', 'ptr'):
                        continue
                    h[t].__setattr__(k, np.asarray(v)[lo:hi])
            for et, s in self._edge.items():
                src_t, _, dst_t = et
                slo = int(np.asarray(self._node[src_t]['ptr'])[g])
                dlo = int(np.asarray(self._node[dst_t]['ptr'])[g])
                shi = int(np.asarray(self._node[src_t]['ptr'])[g + 1])
                ei = s['edge_index']
                coo = np.asarray(ei.coo if isinstance(ei, EdgeIndex) else ei)
                em = np.asarray(s['edge_mask']) & (coo[0] >= slo) \
                    & (coo[0] < shi)
                h[et].edge_index = np.stack(
                    [coo[0][em] - slo, coo[1][em] - dlo])
                for k, v in s.items():
                    if k in ('edge_index', 'edge_mask'):
                        continue
                    va = np.asarray(v)
                    if va.ndim >= 1 and va.shape[0] == em.shape[0]:
                        h[et].__setattr__(k, va[em])
            out.append(h)
        return out

    # -- pytree (extends HeteroData aux with batch statics) ------------------
    def tree_flatten(self):
        children, aux = super().tree_flatten()
        real = tuple(sorted(self._num_real.items(), key=lambda kv: repr(kv)))
        return children, (aux, self._num_graphs, real)

    @classmethod
    def tree_unflatten(cls, aux, children):
        base_aux, num_graphs, real = aux
        obj = super().tree_unflatten(base_aux, children)
        obj._num_graphs = num_graphs
        obj._num_real = dict(real)
        return obj
