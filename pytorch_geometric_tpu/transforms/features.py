"""Feature transforms + positional encodings.

Reference files: ``normalize_features.py``, ``svd_feature_reduction.py``,
``one_hot_degree.py``, ``target_indegree.py``, ``local_degree_profile.py``,
``constant.py``, ``add_positional_encoding.py`` (Laplacian eigenvector /
random-walk PE), ``feature_propagation.py``.
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


class NormalizeFeatures(BaseTransform):
    """Row-normalise attributes to sum 1 (reference
    ``normalize_features.py``)."""

    def __init__(self, attrs=('x',)):
        self.attrs = attrs

    def __call__(self, data: Data) -> Data:
        up = {}
        for k in self.attrs:
            v = data[k]
            if v is None:
                continue
            v = np.asarray(v, np.float32)
            # reference normalize_features.py: shift by the GLOBAL min
            # unconditionally, clamp row sums to >= 1
            if v.size:
                v = v - v.min()
            s = v.sum(-1, keepdims=True)
            up[k] = jnp.asarray(v / np.maximum(s, 1.0))
        return data.replace(**up)


class SVDFeatureReduction(BaseTransform):
    """Dimensionality reduction via truncated SVD (reference
    ``svd_feature_reduction.py``)."""

    def __init__(self, out_channels: int):
        self.out_channels = out_channels

    def __call__(self, data: Data) -> Data:
        x = np.asarray(data.x)
        if x.shape[-1] <= self.out_channels:
            return data
        u, s, _ = np.linalg.svd(x, full_matrices=False)
        x = u[:, :self.out_channels] * s[:self.out_channels]
        return data.replace(x=jnp.asarray(x.astype(np.float32)))


class Constant(BaseTransform):
    """Append constant feature (reference ``constant.py``)."""

    def __init__(self, value: float = 1.0, cat: bool = True):
        self.value = value
        self.cat = cat

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        c = np.full((n, 1), self.value, np.float32)
        if data.x is not None and self.cat:
            x = np.concatenate([np.asarray(data.x), c], -1)
        else:
            x = c
        return data.replace(x=jnp.asarray(x))


class OneHotDegree(BaseTransform):
    """Append one-hot (in-)degree (reference ``one_hot_degree.py``)."""

    def __init__(self, max_degree: int, in_degree: bool = False,
                 cat: bool = True):
        self.max_degree = max_degree
        self.in_degree = in_degree
        self.cat = cat

    def __call__(self, data: Data) -> Data:
        coo = _coo(data)
        idx = coo[1] if self.in_degree else coo[0]
        deg = np.bincount(idx, minlength=data.num_nodes)
        deg = np.minimum(deg, self.max_degree)
        oh = np.eye(self.max_degree + 1, dtype=np.float32)[deg]
        if data.x is not None and self.cat:
            oh = np.concatenate([np.asarray(data.x), oh], -1)
        return data.replace(x=jnp.asarray(oh))


class TargetIndegree(BaseTransform):
    """Edge attr = normalised dst in-degree (reference
    ``target_indegree.py``)."""

    def __init__(self, norm: bool = True, cat: bool = True):
        self.norm = norm
        self.cat = cat

    def __call__(self, data: Data) -> Data:
        coo = _coo(data)
        deg = np.bincount(coo[1], minlength=data.num_nodes).astype(
            np.float32)
        if self.norm and deg.max() > 0:
            deg = deg / deg.max()
        ea = deg[coo[1]][:, None]
        if data.edge_attr is not None and self.cat:
            ea = np.concatenate([np.asarray(data.edge_attr), ea], -1)
        return data.replace(edge_attr=jnp.asarray(ea))


class LocalDegreeProfile(BaseTransform):
    """Append [deg, min/max/mean/std of neighbor degs] (reference
    ``local_degree_profile.py``)."""

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        coo = _coo(data)
        # reference local_degree_profile.py: deg = degree(ROW); neighbor
        # degrees deg[col] aggregated onto ROW
        deg = np.bincount(coo[0], minlength=n).astype(np.float32)
        nd = deg[coo[1]]
        mn = np.full(n, np.inf, np.float32)
        mx = np.full(n, -np.inf, np.float32)
        np.minimum.at(mn, coo[0], nd)
        np.maximum.at(mx, coo[0], nd)
        s = np.zeros(n, np.float32)
        np.add.at(s, coo[0], nd)
        cnt = np.maximum(deg, 1)
        mean = s / cnt
        s2 = np.zeros(n, np.float32)
        np.add.at(s2, coo[0], nd * nd)
        var = np.maximum(s2 / cnt - mean ** 2, 0)
        mn[~np.isfinite(mn)] = 0
        mx[~np.isfinite(mx)] = 0
        prof = np.stack([deg, mn, mx, mean, np.sqrt(var)], -1)
        if data.x is not None:
            prof = np.concatenate([np.asarray(data.x), prof], -1)
        return data.replace(x=jnp.asarray(prof))


class AddLaplacianEigenvectorPE(BaseTransform):
    """k smallest nontrivial Laplacian eigenvectors (reference
    ``add_positional_encoding.py:AddLaplacianEigenvectorPE``)."""

    def __init__(self, k: int, attr_name: Optional[str] = 'laplacian_eigenvector_pe',
                 is_undirected: bool = False):
        self.k = k
        self.attr_name = attr_name
        self.is_undirected = is_undirected

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        coo = _coo(data)
        w = (np.asarray(data.edge_weight, np.float64)
             if data.edge_weight is not None
             else np.ones(coo.shape[1], np.float64))
        # reference semantics (add_positional_encoding.py:36-66 +
        # utils/laplacian.py:68): L = I - D^-1/2 A D^-1/2 with
        # OUT-degree, graph as-is (no symmetrisation); directed graphs
        # use the general eigendecomposition sorted by eigenvalue.
        # Deterministic signs (the reference multiplies by random +-1).
        keep = coo[0] != coo[1]   # get_laplacian drops self-loops
        a = np.zeros((n, n), np.float64)
        np.add.at(a, (coo[0][keep], coo[1][keep]), w[keep])
        deg = a.sum(1)
        dis = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-12)), 0)
        lap = np.eye(n) - dis[:, None] * a * dis[None, :]
        if self.is_undirected:
            vals, vecs = np.linalg.eigh(lap)
        else:
            vals, vecs = np.linalg.eig(lap)
            vecs = np.real(vecs[:, vals.argsort()])
        pe = np.real(vecs[:, 1:self.k + 1])
        if pe.shape[1] < self.k:
            pe = np.pad(pe, ((0, 0), (0, self.k - pe.shape[1])))
        up = {self.attr_name: jnp.asarray(pe.astype(np.float32))} \
            if self.attr_name else \
            {'x': jnp.asarray(np.concatenate(
                [np.asarray(data.x), pe.astype(np.float32)], -1))}
        return data.replace(**up)


class AddRandomWalkPE(BaseTransform):
    """Random-walk landing probabilities diag(RW^k) (reference
    ``add_positional_encoding.py:AddRandomWalkPE``)."""

    def __init__(self, walk_length: int,
                 attr_name: Optional[str] = 'random_walk_pe'):
        self.walk_length = walk_length
        self.attr_name = attr_name

    def __call__(self, data: Data) -> Data:
        n = data.num_nodes
        coo = _coo(data)
        # reference semantics (add_positional_encoding.py:149-154):
        # degree counts duplicate edges, but the dense adjacency entry is
        # ASSIGNED 1/deg (duplicates overwrite, not accumulate)
        deg = np.bincount(coo[0], minlength=n).astype(np.float64)
        p = np.zeros((n, n), np.float64)
        p[coo[0], coo[1]] = 1.0 / np.maximum(deg, 1)[coo[0]]
        pk = p.copy()
        pes = [np.diag(pk)]
        for _ in range(self.walk_length - 1):
            pk = pk @ p
            pes.append(np.diag(pk))
        pe = np.stack(pes, -1).astype(np.float32)
        return data.replace(**{self.attr_name: jnp.asarray(pe)})


class FeaturePropagation(BaseTransform):
    """Fill missing features by diffusion (reference
    ``feature_propagation.py``)."""

    def __init__(self, missing_mask=None, num_iterations: int = 40,
                 missing_mask_key: str = 'missing_mask'):
        # reference feature_propagation.py takes the mask directly; a
        # data-key fallback is kept for pipeline-style use
        self.missing_mask = missing_mask
        self.key = missing_mask_key
        self.num_iterations = num_iterations

    def __call__(self, data: Data) -> Data:
        from ..nn.conv.gcn_conv import gcn_norm
        from ..ops import scatter
        n = data.num_nodes
        miss = (self.missing_mask if self.missing_mask is not None
                else data[self.key])
        miss = (np.asarray(miss) if miss is not None
                else np.isnan(np.asarray(data.x)))
        x = np.nan_to_num(np.asarray(data.x)).astype(np.float32)
        coo, w = gcn_norm(jnp.asarray(_coo(data)), None, n,
                          add_self_loops=False)
        x0 = jnp.asarray(x)
        known = jnp.asarray(~miss)
        out = x0
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        for _ in range(self.num_iterations):
            out = scatter(out[src] * w[:, None], dst, n, 'sum')
            out = jnp.where(known, x0, out)
        return data.replace(x=out)
