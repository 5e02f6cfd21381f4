"""Diffusion / metapath / ego-net transforms.

Reference: ``torch_geometric/transforms/gdc.py`` (graph diffusion
convolution), ``add_metapaths.py``, ``rooted_subgraph.py``
(RootedEgoNets), ``half_hop.py``.
"""

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .base import BaseTransform
from ..data.data import Data
from ..data.hetero_data import HeteroData
from ..edge_index import EdgeIndex


def _coo(data):
    ei = data.edge_index
    return np.asarray(ei.coo if isinstance(ei, EdgeIndex) else ei)


class GDC(BaseTransform):
    """Graph diffusion convolution (reference ``transforms/gdc.py``):
    dense PPR or heat-kernel diffusion + sparsification (top-k or
    epsilon threshold)."""

    def __init__(self, self_loop_weight: float = 1.0,
                 normalization_in: str = 'sym',
                 normalization_out: str = 'col',
                 diffusion_kwargs: Optional[dict] = None,
                 sparsification_kwargs: Optional[dict] = None):
        self.self_loop_weight = self_loop_weight
        self.norm_in = normalization_in
        self.norm_out = normalization_out
        self.diff = diffusion_kwargs or {'method': 'ppr', 'alpha': 0.15}
        self.sparse = sparsification_kwargs or {'method': 'threshold',
                                                'eps': 1e-4}

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        coo = _coo(data)
        a = np.zeros((n, n))
        np.add.at(a, (coo[0], coo[1]), 1.0)
        if self.self_loop_weight:
            a += self.self_loop_weight * np.eye(n)
        # input normalisation
        if self.norm_in == 'sym':
            # reference gdc.py transition_matrix 'sym': degrees are
            # COLUMN sums (scatter over col)
            d = np.maximum(a.sum(0), 1e-12)
            dis = 1 / np.sqrt(d)
            t = dis[:, None] * a * dis[None, :]
        elif self.norm_in == 'col':
            t = a / np.maximum(a.sum(0, keepdims=True), 1e-12)
        else:  # 'row'
            t = a / np.maximum(a.sum(1, keepdims=True), 1e-12)
        # diffusion
        if self.diff['method'] == 'ppr':
            alpha = self.diff.get('alpha', 0.15)
            s = alpha * np.linalg.inv(
                np.eye(n) - (1 - alpha) * t)
        elif self.diff['method'] == 'heat':
            from scipy.linalg import expm
            tt = self.diff.get('t', 5.0)
            s = expm(-tt * (np.eye(n) - t))
        else:
            raise ValueError(self.diff['method'])
        # sparsification
        if self.sparse['method'] == 'threshold':
            if 'eps' in self.sparse:
                eps = self.sparse['eps']
            elif 'avg_degree' in self.sparse:
                # reference gdc.py __calculate_eps__: eps midway between
                # the (avg_degree*N)-th and next largest entries
                kth = self.sparse['avg_degree'] * n
                srt = np.sort(s.reshape(-1))[::-1]
                eps = (-np.inf if kth >= len(srt)
                       else (srt[kth - 1] + srt[kth]) / 2)
            else:
                eps = 1e-4
            s[s < eps] = 0
        else:  # topk per column
            k = self.sparse.get('k', 16)
            thresh = -np.sort(-s, axis=0)[min(k, n) - 1]
            s[s < thresh[None, :]] = 0
        # output normalisation
        if self.norm_out == 'col':
            s = s / np.maximum(s.sum(0, keepdims=True), 1e-12)
        elif self.norm_out == 'row':
            s = s / np.maximum(s.sum(1, keepdims=True), 1e-12)
        r, c = np.nonzero(s)
        return data.replace(
            edge_index=jnp.asarray(np.stack([r, c]).astype(np.int32)),
            edge_attr=jnp.asarray(s[r, c].astype(np.float32)))


class AddMetaPaths(BaseTransform):
    """Add composed metapath edge types to a HeteroData (reference
    ``transforms/add_metapaths.py``)."""

    def __init__(self, metapaths: Sequence[Sequence[Tuple[str, str, str]]],
                 drop_orig_edge_types: bool = False,
                 max_edges: Optional[int] = None):
        self.metapaths = metapaths
        self.drop_orig = drop_orig_edge_types
        self.max_edges = max_edges

    def __call__(self, data: HeteroData) -> HeteroData:
        import scipy.sparse as sp
        orig_types = list(data.edge_types)
        for j, mp in enumerate(self.metapaths):
            assert all(mp[i][2] == mp[i + 1][0]
                       for i in range(len(mp) - 1)), 'path must chain'
            mats = []
            for et in mp:
                src_t, _, dst_t = et
                coo = np.asarray(data[et].edge_index)
                n_src = data[src_t].num_nodes or int(coo[0].max()) + 1
                n_dst = data[dst_t].num_nodes or int(coo[1].max()) + 1
                mats.append(sp.coo_matrix(
                    (np.ones(coo.shape[1]), (coo[0], coo[1])),
                    shape=(n_src, n_dst)).tocsr())
            m = mats[0]
            for nxt in mats[1:]:
                m = m @ nxt
            m = m.tocoo()
            row, col = m.row, m.col
            if self.max_edges is not None and len(row) > self.max_edges:
                sel = np.argsort(-m.data)[:self.max_edges]
                row, col = row[sel], col[sel]
            new_type = (mp[0][0], f'metapath_{j}', mp[-1][2])
            data[new_type].edge_index = np.stack([row, col]).astype(
                np.int32)
        if self.drop_orig:
            for et in orig_types:
                data._edge.pop(et, None)
        return data


class RootedEgoNets(BaseTransform):
    """Precompute per-node k-hop ego-net membership (reference
    ``transforms/rooted_subgraph.py``): adds ``sub_node_index`` /
    ``sub_root`` arrays describing every node's ego subgraph."""

    def __init__(self, num_hops: int = 1):
        self.num_hops = num_hops

    def __call__(self, data: Data) -> Data:
        coo = _coo(data)
        n = data.num_nodes
        # reference rooted_subgraph.py: dense reachability over INCOMING
        # edges from each root, then (n_id, e_id) nonzero maps and a
        # per-subgraph relabeled sub_edge_index
        A = np.zeros((n, n), bool)
        A[coo[0], coo[1]] = True
        reach = np.eye(n, dtype=bool)
        for _ in range(self.num_hops):
            reach = reach | (reach @ A.T)
        n_sub_batch, n_id = np.nonzero(reach)
        e_mask = reach[:, coo[0]] & reach[:, coo[1]]
        e_sub_batch, e_id = np.nonzero(e_mask)
        node_map = np.zeros((n, n), np.int64)
        node_map[n_sub_batch, n_id] = np.arange(len(n_id))
        sub_edge_index = node_map[e_sub_batch, coo[:, e_id]]
        i32 = lambda a: jnp.asarray(a.astype(np.int32))
        return data.replace(
            sub_edge_index=i32(sub_edge_index), n_id=i32(n_id),
            e_id=i32(e_id), n_sub_batch=i32(n_sub_batch),
            e_sub_batch=i32(e_sub_batch),
            # aliases kept from the round-1 API
            sub_root=i32(n_sub_batch), sub_node_index=i32(n_id))


class HalfHop(BaseTransform):
    """Insert slow nodes on edges (reference ``transforms/half_hop.py``):
    each selected edge u->v becomes u->w, w->v (+ v's features on w)."""

    def __init__(self, alpha: float = 0.5, p: float = 1.0,
                 seed: int = 0):
        self.alpha = alpha
        self.p = p
        self.rng = np.random.default_rng(seed)

    def __call__(self, data: Data) -> Data:
        coo = _coo(data)
        n = data.num_nodes
        # reference half_hop.py: self-loops are never half-hopped, and
        # the p-sampling is per DESTINATION NODE, not per edge
        loop = coo[0] == coo[1]
        loops, plain = coo[:, loop], coo[:, ~loop]
        node_sel = self.rng.random(n) < self.p
        sel = node_sel[plain[1]]
        k = int(sel.sum())
        new_ids = n + np.arange(k)
        src, dst = plain[0][sel], plain[1][sel]
        kept = plain[:, ~sel]
        new_edges = np.concatenate([
            kept, loops,
            np.stack([src, new_ids]),
            np.stack([new_ids, dst]),
            np.stack([dst, new_ids]),
        ], axis=1)
        x = np.asarray(data.x)
        # x_slow = alpha * x_src + (1 - alpha) * x_dst (reference :76)
        x_new = self.alpha * x[src] + (1 - self.alpha) * x[dst]
        slow_mask = np.zeros(n + k, bool)
        slow_mask[n:] = True
        return data.replace(
            x=jnp.asarray(np.concatenate([x, x_new])),
            edge_index=jnp.asarray(new_edges.astype(np.int32)),
            slow_node_mask=jnp.asarray(slow_mask),
            num_nodes=n + k)
