"""Structural transforms.

Reference files under ``torch_geometric/transforms/``: ``to_undirected.py``,
``add_self_loops.py``, ``remove_self_loops.py``,
``remove_isolated_nodes.py``, ``remove_duplicated_edges.py``,
``two_hop.py``, ``virtual_node.py``, ``line_graph.py``, ``gcn_norm.py``,
``sign.py``, ``face_to_edge.py``, ``to_sparse_tensor.py``, ``pad.py``.
All host-side numpy graph rewrites.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .base import BaseTransform
from ..data import Data
from ..edge_index import EdgeIndex


def _coo(data) -> np.ndarray:
    ei = data.edge_index
    return np.asarray(ei.coo if isinstance(ei, EdgeIndex) else ei)


def _edge_attrs(data):
    n, e = data.num_nodes, data.num_edges
    return [k for k, v in data.items()
            if k != 'edge_index' and hasattr(v, 'shape') and v.ndim >= 1
            and v.shape[0] == e and (e != n or k.startswith('edge_'))]


class ToUndirected(BaseTransform):
    """Add reverse edges (+ coalesce) (reference ``to_undirected.py``)."""

    def __init__(self, reduce: str = 'add', merge: bool = True):
        self.reduce = reduce

    def __call__(self, data: Data) -> Data:
        from ..utils.coalesce import to_undirected
        coo = _coo(data)
        keys = _edge_attrs(data)
        attrs = [np.asarray(data[k]) for k in keys]
        if attrs:
            new_coo, new_attrs = to_undirected(
                coo, attrs, num_nodes=data.num_nodes, reduce=self.reduce)
        else:
            new_coo = to_undirected(coo, num_nodes=data.num_nodes,
                                    reduce=self.reduce)
            new_attrs = []
        updates = {'edge_index': jnp.asarray(new_coo)}
        for k, v in zip(keys, new_attrs):
            updates[k] = jnp.asarray(v)
        return data.replace(**updates)


class AddSelfLoops(BaseTransform):
    """(reference ``add_self_loops.py``)."""

    def __init__(self, fill_value: float = 1.0):
        self.fill_value = fill_value

    def __call__(self, data: Data) -> Data:
        from ..utils.loop import add_self_loops
        coo = jnp.asarray(_coo(data))
        ea = data.edge_attr
        coo, ea = add_self_loops(coo, ea, fill_value=self.fill_value,
                                 num_nodes=data.num_nodes)
        up = {'edge_index': coo}
        if ea is not None:
            up['edge_attr'] = ea
        return data.replace(**up)


class RemoveSelfLoops(BaseTransform):
    """(reference ``remove_self_loops.py``) — host-side (shrinks E)."""

    def __call__(self, data: Data) -> Data:
        coo = _coo(data)
        keep = coo[0] != coo[1]
        up = {'edge_index': jnp.asarray(coo[:, keep])}
        for k in _edge_attrs(data):
            up[k] = jnp.asarray(np.asarray(data[k])[keep])
        return data.replace(**up)


class RemoveDuplicatedEdges(BaseTransform):
    """(reference ``remove_duplicated_edges.py``)."""

    def __init__(self, reduce: str = 'add'):
        self.reduce = reduce

    def __call__(self, data: Data) -> Data:
        from ..utils.coalesce import coalesce
        coo = _coo(data)
        keys = _edge_attrs(data)
        attrs = [np.asarray(data[k]) for k in keys]
        out = coalesce(coo, attrs if attrs else None,
                       num_nodes=data.num_nodes, reduce=self.reduce)
        if attrs:
            new_coo, new_attrs = out
        else:
            new_coo, new_attrs = out, []
        up = {'edge_index': jnp.asarray(new_coo)}
        for k, v in zip(keys, new_attrs):
            up[k] = jnp.asarray(v)
        return data.replace(**up)


class RemoveIsolatedNodes(BaseTransform):
    """(reference ``remove_isolated_nodes.py``)."""

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        coo = _coo(data)
        used = np.zeros(n, bool)
        used[coo.reshape(-1)] = True
        relabel = np.cumsum(used) - 1
        new_coo = relabel[coo]
        up = {'edge_index': jnp.asarray(new_coo.astype(np.int32))}
        for k, v in data.items():
            if k == 'edge_index' or not hasattr(v, 'shape'):
                continue
            va = np.asarray(v)
            if va.ndim >= 1 and va.shape[0] == n:
                up[k] = jnp.asarray(va[used])
        return data.replace(num_nodes=int(used.sum()), **up)


class TwoHop(BaseTransform):
    """Add 2-hop edges (reference ``two_hop.py``)."""

    def __call__(self, data: Data) -> Data:
        import scipy.sparse as sp
        n = data.num_nodes
        coo = _coo(data)
        a = sp.coo_matrix((np.ones(coo.shape[1]), (coo[0], coo[1])),
                          shape=(n, n)).tocsr()
        a2 = (a @ a).tocoo()
        # self-loops are removed from the NEW 2-hop edges only; original
        # loops survive (reference two_hop.py: remove_self_loops on
        # edge_index2 before the union)
        keep2 = a2.row != a2.col
        row = np.concatenate([coo[0], a2.row[keep2]])
        col = np.concatenate([coo[1], a2.col[keep2]])
        pairs = np.unique(np.stack([row, col]), axis=1)
        return data.replace(edge_index=jnp.asarray(
            pairs.astype(np.int32)), edge_attr=None)


class VirtualNode(BaseTransform):
    """Append one node connected to all others (reference
    ``virtual_node.py``)."""

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        coo = _coo(data)
        arange = np.arange(n)
        full = np.concatenate([
            coo,
            np.stack([arange, np.full(n, n)]),
            np.stack([np.full(n, n), arange]),
        ], axis=1).astype(np.int32)
        up = {'edge_index': jnp.asarray(full)}
        if data.x is not None:
            x = np.asarray(data.x)
            up['x'] = jnp.asarray(np.concatenate(
                [x, np.zeros((1, x.shape[1]), x.dtype)]))
        # edge type vector: 0 original, 1 out to vnode, 2 in from vnode
        et = np.concatenate([np.zeros(coo.shape[1], np.int32),
                             np.ones(n, np.int32),
                             np.full(n, 2, np.int32)])
        up['edge_type'] = jnp.asarray(et)
        return data.replace(num_nodes=n + 1, **up)


class LineGraph(BaseTransform):
    """Edge graph: nodes = edges, connected when sharing an endpoint
    (reference ``line_graph.py``, directed variant)."""

    def __call__(self, data: Data) -> Data:
        coo = _coo(data)
        e = coo.shape[1]
        # edge u->v connects to edge v->w
        src_of = coo[0]
        dst_of = coo[1]
        rows, cols = [], []
        by_src = {}
        for j in range(e):
            by_src.setdefault(int(src_of[j]), []).append(j)
        for i in range(e):
            for j in by_src.get(int(dst_of[i]), ()):
                rows.append(i)
                cols.append(j)
        new_coo = np.stack([np.array(rows, np.int32),
                            np.array(cols, np.int32)]) if rows else \
            np.zeros((2, 0), np.int32)
        x = data.edge_attr
        return Data(x=x, edge_index=jnp.asarray(new_coo), num_nodes=e)


class GCNNorm(BaseTransform):
    """Precompute gcn_norm edge weights (reference ``gcn_norm.py``)."""

    def __init__(self, add_self_loops: bool = True):
        self.add_self_loops = add_self_loops

    def __call__(self, data: Data) -> Data:
        from ..nn.conv.gcn_conv import gcn_norm
        coo, w = gcn_norm(jnp.asarray(_coo(data)), data.edge_weight,
                          data.num_nodes,
                          add_self_loops=self.add_self_loops)
        return data.replace(edge_index=coo, edge_weight=w)


class SIGN(BaseTransform):
    """Precompute K diffused feature matrices ``x1..xK``
    (reference ``sign.py``)."""

    def __init__(self, K: int):
        self.K = K

    def __call__(self, data: Data) -> Data:
        from ..nn.conv.gcn_conv import gcn_norm
        n = data.num_nodes
        coo, w = gcn_norm(jnp.asarray(_coo(data)), None, n,
                          add_self_loops=False)
        from ..ops import scatter
        x = data.x
        up = {}
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        for k in range(1, self.K + 1):
            x = scatter(x[src] * w[:, None], dst, n, 'sum')
            up[f'x{k}'] = x
        return data.replace(**up)


class FaceToEdge(BaseTransform):
    """Mesh faces [3, F] -> undirected edges (reference
    ``face_to_edge.py``)."""

    def __init__(self, remove_faces: bool = True):
        self.remove_faces = remove_faces

    def __call__(self, data: Data) -> Data:
        face = np.asarray(data.face)
        ei = np.concatenate([face[[0, 1]], face[[1, 2]], face[[2, 0]]],
                            axis=1)
        ei = np.concatenate([ei, ei[::-1]], axis=1)
        ei = np.unique(ei, axis=1)
        up = {'edge_index': jnp.asarray(ei.astype(np.int32))}
        if self.remove_faces:
            up['face'] = None
        return data.replace(**up)


class ToSparseTensor(BaseTransform):
    """Materialise cached CSR/CSC orientations (the TPU analog of the
    reference's SparseTensor conversion, ``to_sparse_tensor.py``)."""

    def __call__(self, data: Data) -> Data:
        ei = data.edge_index
        if not isinstance(ei, EdgeIndex):
            ei = EdgeIndex(jnp.asarray(ei),
                           (data.num_nodes, data.num_nodes))
        return data.replace(edge_index=ei.fill_cache())


class Pad(BaseTransform):
    """Pad to static budgets (reference ``pad.py:209`` — built for
    static-shape accelerators). Padded edges point at ``num_nodes``."""

    def __init__(self, max_num_nodes: int,
                 max_num_edges: Optional[int] = None,
                 node_pad_value: float = 0.0,
                 edge_pad_value: float = 0.0):
        self.max_num_nodes = max_num_nodes
        self.max_num_edges = max_num_edges
        self.node_pad_value = node_pad_value
        self.edge_pad_value = edge_pad_value

    def __call__(self, data: Data) -> Data:
        n, e = data.num_nodes, data.num_edges
        pn = self.max_num_nodes
        pe = self.max_num_edges if self.max_num_edges is not None else e
        if pn < n or pe < e:
            raise ValueError(f'Pad budget ({pn},{pe}) < actual ({n},{e})')
        coo = _coo(data)
        coo = np.concatenate(
            [coo, np.full((2, pe - e), pn, coo.dtype)], axis=1)
        up = {'edge_index': EdgeIndex(jnp.asarray(coo), (pn, pn),
                                      num_real_edges=e)}
        for k, v in data.items():
            if k == 'edge_index' or not hasattr(v, 'shape'):
                continue
            va = np.asarray(v)
            if va.ndim >= 1 and va.shape[0] == n and k != 'y':
                pad = np.full((pn - n,) + va.shape[1:],
                              self.node_pad_value, va.dtype)
                up[k] = jnp.asarray(np.concatenate([va, pad]))
            elif va.ndim >= 1 and va.shape[0] == e:
                pad = np.full((pe - e,) + va.shape[1:],
                              self.edge_pad_value, va.dtype)
                up[k] = jnp.asarray(np.concatenate([va, pad]))
        up['node_mask'] = jnp.arange(pn) < n
        up['edge_mask'] = jnp.arange(pe) < e
        return data.replace(num_nodes=pn, **up)


class ReorderNodes(BaseTransform):
    """Relabel nodes to maximise cached block-sparse adjacency fill
    (TPU-specific; companion of ``ops/bsr_spmm.py``). ``method``:
    'rcm' (bandwidth-minimising BFS), 'degree' (hubs first) or
    'cluster' (partitioner-contiguous, reference
    ``loader/cluster.py:128`` layout). Stores the applied permutation
    as ``data.node_perm`` (``node_perm[new] = old``) so predictions can
    be mapped back.

    Measured on a scrambled power-law graph (100k nodes / 1M edges):
    128x128-block capture fraction 0.22 natural -> 0.71 degree /
    0.69 rcm / 0.42 cluster; nonempty blocks cut 2.6x by 'degree'
    (``benchmarks/reorder_quality.py``). 'degree' is the right default
    for scale-free graphs; 'rcm' wins on meshes/grids."""

    def __init__(self, method: str = 'degree', block: int = 128):
        if method not in ('rcm', 'degree', 'cluster'):
            raise ValueError(f"Unknown reorder method {method!r}")
        self.method = method
        self.block = block

    def __call__(self, data: Data) -> Data:
        from ..utils.reorder import (reverse_cuthill_mckee, degree_order,
                                     cluster_order,
                                     apply_node_permutation)
        n = data.num_nodes
        coo = _coo(data)
        if self.method == 'rcm':
            perm = reverse_cuthill_mckee(coo, n)
        elif self.method == 'degree':
            perm = degree_order(coo, n)
        else:
            perm = cluster_order(coo, n, block=self.block)
        out, _ = apply_node_permutation(data, perm)
        return out.replace(node_perm=perm)
