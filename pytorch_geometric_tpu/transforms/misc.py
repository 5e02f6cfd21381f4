"""Long-tail transforms.

Reference: ``torch_geometric/transforms/`` — add_remaining_self_loops.py,
compose.py (ComposeFilters), delaunay.py, fixed_points.py,
generate_mesh_normals.py, laplacian_lambda_max.py,
largest_connected_components.py, linear_transformation.py,
local_cartesian.py, node_property_split.py, normalize_rotation.py,
point_pair_features.py, remove_training_classes.py,
rooted_subgraph.py (RootedRWSubgraph), to_dense.py, to_device.py,
add_metapaths.py (AddRandomMetaPaths).
"""

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseTransform
from ..data import Data


def _coo(data):
    ei = data.edge_index
    return np.asarray(ei.coo if hasattr(ei, 'coo') else ei)


class ComposeFilters:
    """AND-composition of dataset filters (reference ``compose.py:46``)."""

    def __init__(self, filters: Sequence[Callable]):
        self.filters = list(filters)

    def __call__(self, data) -> bool:
        return all(f(data) for f in self.filters)


class AddRemainingSelfLoops(BaseTransform):
    """(reference ``add_remaining_self_loops.py``)."""

    def __init__(self, attr: str = 'edge_weight', fill_value=1.0):
        self.attr, self.fill_value = attr, fill_value

    def __call__(self, data):
        from ..utils.loop import add_remaining_self_loops
        coo = _coo(data)
        w = data[self.attr] if self.attr in data.keys() else None
        n = data.num_nodes
        coo2, w2 = add_remaining_self_loops(
            jnp.asarray(coo), w, fill_value=self.fill_value,
            num_nodes=n)
        data.edge_index = coo2
        if w2 is not None:
            data[self.attr] = w2
        return data


class Delaunay(BaseTransform):
    """Delaunay triangulation of ``pos`` -> ``face``
    (reference ``delaunay.py``)."""

    def __call__(self, data):
        import scipy.spatial
        pos = np.asarray(data.pos)
        if pos.shape[0] < 3:
            data.face = np.zeros((3, 0), np.int64)
            return data
        tri = scipy.spatial.Delaunay(pos[:, :2], qhull_options='QJ')
        data.face = tri.simplices.T.astype(np.int64)
        return data


class FixedPoints(BaseTransform):
    """Sample a fixed number of points (reference ``fixed_points.py``)."""

    def __init__(self, num: int, replace: bool = True,
                 allow_duplicates: bool = False, seed: int = 0):
        self.num, self.replace = num, replace
        self.allow_duplicates = allow_duplicates
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        n = data.num_nodes
        if self.replace:
            idx = self.rng.integers(0, n, self.num)
        elif not self.allow_duplicates:
            idx = self.rng.permutation(n)[:self.num]
        else:
            idx = np.concatenate([
                self.rng.permutation(n),
                self.rng.integers(0, n, max(self.num - n, 0))])[:self.num]
        for k in list(data.keys()):
            v = np.asarray(data[k])
            if v.ndim >= 1 and v.shape[0] == n:
                data[k] = v[idx]
        data.num_nodes = len(idx)
        return data


class GenerateMeshNormals(BaseTransform):
    """Per-vertex normals from faces (reference
    ``generate_mesh_normals.py``)."""

    def __call__(self, data):
        pos = np.asarray(data.pos)
        face = np.asarray(data.face)
        vec1 = pos[face[1]] - pos[face[0]]
        vec2 = pos[face[2]] - pos[face[0]]
        fn = np.cross(vec1, vec2)
        fn = fn / np.maximum(np.linalg.norm(fn, axis=1, keepdims=True),
                             1e-12)
        norm = np.zeros_like(pos)
        for k in range(3):
            np.add.at(norm, face[k], fn)
        norm = norm / np.maximum(np.linalg.norm(norm, axis=1,
                                                keepdims=True), 1e-12)
        data.norm = norm.astype(np.float32)
        return data


class LaplacianLambdaMax(BaseTransform):
    """(reference ``laplacian_lambda_max.py``)."""

    def __init__(self, normalization: Optional[str] = 'sym',
                 is_undirected: bool = False):
        self.normalization = normalization
        self.is_undirected = is_undirected

    def __call__(self, data):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spl
        from ..utils.extra import get_laplacian
        w = data.edge_weight if 'edge_weight' in data.keys() else None
        if w is None and 'edge_attr' in data.keys():
            ea = data.edge_attr
            # reference laplacian_lambda_max.py: 1-D edge_attr is the
            # edge weight
            if ea is not None and np.asarray(ea).ndim == 1:
                w = ea
        coo, lw = get_laplacian(jnp.asarray(_coo(data)), w,
                                normalization=self.normalization,
                                num_nodes=data.num_nodes)
        n = data.num_nodes
        L = sp.coo_matrix((np.asarray(lw),
                           (np.asarray(coo[0]), np.asarray(coo[1]))),
                          shape=(n, n))
        try:
            lam = spl.eigsh(L, k=1, which='LM',
                            return_eigenvectors=False) \
                if self.is_undirected else \
                spl.eigs(L, k=1, which='LM', return_eigenvectors=False)
            data.lambda_max = float(np.real(lam[0]))
        except Exception:
            data.lambda_max = 2.0
        return data


class LargestConnectedComponents(BaseTransform):
    """Keep the k largest components
    (reference ``largest_connected_components.py``)."""

    def __init__(self, num_components: int = 1,
                 connection: str = 'weak'):
        self.num_components = num_components
        self.connection = connection

    def __call__(self, data):
        import scipy.sparse as sp
        import scipy.sparse.csgraph as csg
        coo = _coo(data)
        n = data.num_nodes
        adj = sp.coo_matrix((np.ones(coo.shape[1]), (coo[0], coo[1])),
                            shape=(n, n))
        ncomp, label = csg.connected_components(
            adj, connection=self.connection)
        if ncomp <= self.num_components:
            return data
        counts = np.bincount(label)
        keep_labels = np.argsort(-counts)[:self.num_components]
        keep = np.isin(label, keep_labels)
        from ..utils.subgraph import subgraph
        # subgraph() already returns only the kept (relabeled) edges
        new_coo, _, _ = subgraph(keep, coo, num_nodes=n,
                                 relabel_nodes=True)
        new_coo = np.asarray(new_coo)
        for k in list(data.keys()):
            v = np.asarray(data[k])
            if k != 'edge_index' and v.ndim >= 1 and v.shape[0] == n:
                data[k] = v[keep]
        data.edge_index = new_coo
        data.num_nodes = int(keep.sum())
        return data


class LinearTransformation(BaseTransform):
    """pos @ A^T (reference ``linear_transformation.py``)."""

    def __init__(self, matrix):
        self.matrix = np.asarray(matrix, np.float32)

    def __call__(self, data):
        data.pos = np.asarray(data.pos) @ self.matrix.T
        return data


class LocalCartesian(BaseTransform):
    """Neighborhood-normalized relative coordinates
    (reference ``local_cartesian.py``)."""

    def __init__(self, norm: bool = True, cat: bool = True):
        self.norm, self.cat = norm, cat

    def __call__(self, data):
        coo = _coo(data)
        pos = np.asarray(data.pos)
        cart = pos[coo[0]] - pos[coo[1]]
        absmax = np.zeros(data.num_nodes)
        np.maximum.at(absmax, coo[1], np.abs(cart).max(-1))
        cart = cart / np.maximum(2 * absmax[coo[1], None], 1e-12) + 0.5
        ea = data.edge_attr if 'edge_attr' in data.keys() else None
        if ea is not None and self.cat:
            data.edge_attr = np.concatenate(
                [np.asarray(ea).reshape(len(cart), -1), cart], -1)
        else:
            data.edge_attr = cart.astype(np.float32)
        return data


class NodePropertySplit(BaseTransform):
    """Structure-property-ordered node splits for GOOD-style shift
    benchmarks (reference ``node_property_split.py``): popularity is
    pagerank, locality is personalized pagerank seeded at the
    max-pagerank node, density is the clustering coefficient — all on
    the undirected self-loop-free networkx view. The three in-
    distribution masks are shuffled among themselves (reference
    ``:133-135``); the two OOD masks follow the exact property order.
    """

    def __init__(self, property_name: str, ratios: List[float],
                 ascending: bool = True, seed: int = 0):
        if property_name not in ('popularity', 'locality', 'density'):
            raise ValueError(f"Unexpected 'property_name' "
                             f"(got '{property_name}')")
        if len(ratios) != 5:
            raise ValueError(f"'ratios' must contain 5 values "
                             f"(got {len(ratios)})")
        if abs(sum(ratios) - 1.0) > 1e-9:
            raise ValueError(f"'ratios' must sum to 1.0 "
                             f"(got {sum(ratios)})")
        self.property_name = property_name
        self.ratios = ratios
        self.ascending = ascending
        self.seed = seed

    def _property(self, data) -> np.ndarray:
        import networkx as nx
        from ..utils.convert import to_networkx
        G = to_networkx(data, to_undirected=True, remove_self_loops=True)
        if self.property_name == 'popularity':
            vals = np.asarray(list(nx.pagerank(G).values()))
        elif self.property_name == 'locality':
            pr = np.asarray(list(nx.pagerank(G).values()))
            pers = {i: 0.0 for i in range(data.num_nodes)}
            pers[int(pr.argmax())] = 1.0
            vals = np.asarray(
                list(nx.pagerank(G, personalization=pers).values()))
        else:
            vals = np.asarray(list(nx.clustering(G).values()))
        return vals * (-1 if self.ascending else 1)

    def __call__(self, data):
        n = data.num_nodes
        prop = self._property(data)
        rng = np.random.default_rng(self.seed)
        sizes = np.round(np.asarray(self.ratios) * n).astype(int)
        sizes[-1] -= sizes.sum() - n
        perm = rng.permutation(n)
        id_size = int(sizes[:3].sum())
        perm = perm[np.argsort(prop[perm], kind='stable')]
        perm[:id_size] = perm[:id_size][rng.permutation(id_size)]
        names = ['id_train_mask', 'id_val_mask', 'id_test_mask',
                 'ood_val_mask', 'ood_test_mask']
        lo = 0
        for name, sz in zip(names, sizes):
            mask = np.zeros(n, bool)
            mask[perm[lo:lo + sz]] = True
            data[name] = mask
            lo += sz
        return data


class NormalizeRotation(BaseTransform):
    """Rotate to PCA frame (reference ``normalize_rotation.py``)."""

    def __init__(self, max_points: int = -1, sort: bool = False):
        self.max_points, self.sort = max_points, sort

    def __call__(self, data):
        pos = np.asarray(data.pos, np.float32)
        sample = pos
        if 0 < self.max_points < pos.shape[0]:
            sample = pos[np.random.default_rng(0).permutation(
                pos.shape[0])[:self.max_points]]
        sample = sample - sample.mean(0)
        # reference normalize_rotation.py: eigenvectors of C = pos^T pos
        # via LAPACK geev (same order/sign as torch.linalg.eig), sorted
        # by eigenvalue only when sort=True
        C = sample.T @ sample
        e, v = np.linalg.eig(C)
        e, v = e.real, v.real
        if self.sort:
            v = v[:, np.argsort(-e)]
        data.pos = (pos @ v).astype(np.float32)
        if 'normal' in data.keys() and data.normal is not None:
            nrm = np.asarray(data.normal, np.float32) @ v
            nrm /= np.maximum(
                np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
            data.normal = jnp.asarray(nrm)
        if 'norm' in data.keys():
            data.norm = (np.asarray(data.norm) @ vt.T).astype(np.float32)
        return data


class PointPairFeatures(BaseTransform):
    """PPF edge features (reference ``point_pair_features.py``)."""

    @staticmethod
    def _angle(v1, v2):
        cross = jnp.linalg.norm(jnp.cross(v1, v2), axis=-1)
        dot = (v1 * v2).sum(-1)
        return jnp.arctan2(cross, dot)

    def __call__(self, data):
        coo = _coo(data)
        pos = jnp.asarray(data.pos)
        norm = jnp.asarray(data.norm)
        # reference ppf_conv.point_pair_features: d = pos_j - pos_i with
        # i = row (edge_index[0]), j = col; angles vs n_i first
        d = pos[coo[1]] - pos[coo[0]]
        ppf = jnp.stack([
            jnp.linalg.norm(d, axis=-1),
            self._angle(norm[coo[0]], d),
            self._angle(norm[coo[1]], d),
            self._angle(norm[coo[0]], norm[coo[1]])], -1)
        ea = data.edge_attr if 'edge_attr' in data.keys() else None
        if ea is not None:
            data.edge_attr = jnp.concatenate(
                [jnp.asarray(ea).reshape(ppf.shape[0], -1), ppf], -1)
        else:
            data.edge_attr = ppf
        return data


class RemoveTrainingClasses(BaseTransform):
    """Zero-shot setup: strip train labels of given classes
    (reference ``remove_training_classes.py``)."""

    def __init__(self, classes: List[int]):
        self.classes = classes

    def __call__(self, data):
        mask = np.asarray(data.train_mask).copy()
        y = np.asarray(data.y)
        for c in self.classes:
            mask[y == c] = False
        data.train_mask = mask
        return data


class RootedRWSubgraph(BaseTransform):
    """Rooted random-walk subgraph per node (reference
    ``rooted_subgraph.py:RootedRWSubgraph``): adds n_id/e_id mappings of
    a fixed-length walk-induced subgraph rooted at every node."""

    def __init__(self, walk_length: int = 3, repeat: int = 1,
                 seed: int = 0):
        self.walk_length, self.repeat, self.seed = walk_length, repeat, \
            seed

    def __call__(self, data):
        coo = _coo(data)
        n = data.num_nodes
        rng = np.random.default_rng(self.seed)
        order = np.argsort(coo[0], kind='stable')
        rowptr = np.searchsorted(coo[0][order], np.arange(n + 1))
        col = coo[1][order]
        L = self.walk_length * self.repeat
        walks = np.zeros((n, L + 1), np.int64)
        walks[:, 0] = np.arange(n)
        for r in range(self.repeat):
            cur = np.arange(n)
            for t in range(self.walk_length):
                lo = rowptr[cur]
                deg = rowptr[cur + 1] - lo
                pick = np.minimum(
                    lo + rng.integers(0, 2 ** 31, n)
                    % np.maximum(deg, 1), len(col) - 1)
                nxt = np.where(deg > 0, col[pick], cur)
                walks[:, 1 + r * self.walk_length + t] = nxt
                cur = nxt
        data.sub_n_id = walks
        return data


class ToDense(BaseTransform):
    """Dense adjacency + padded x (reference ``to_dense.py``)."""

    def __init__(self, num_nodes: Optional[int] = None):
        self.num_nodes = num_nodes

    def __call__(self, data):
        from ..utils.dense import to_dense_adj
        n = self.num_nodes or data.num_nodes
        coo = _coo(data)
        w = data.edge_attr if 'edge_attr' in data.keys() else None
        batch = jnp.zeros((data.num_nodes,), jnp.int32)
        data.adj = to_dense_adj(jnp.asarray(coo), batch, 1, n,
                                edge_attr=w)[0]
        if 'x' in data.keys():
            x = np.asarray(data.x)
            pad = np.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)
            data.x = np.concatenate([x, pad], 0)
        mask = np.zeros(n, bool)
        mask[:data.num_nodes] = True
        data.mask = mask
        data.num_nodes = n
        return data


class ToDevice(BaseTransform):
    """Device placement (reference ``to_device.py``) via
    ``jax.device_put``."""

    def __init__(self, device=None, attrs: Optional[List[str]] = None):
        self.device = device
        self.attrs = attrs

    def __call__(self, data):
        for k in (self.attrs or list(data.keys())):
            v = data[k]
            if hasattr(v, 'shape'):
                data[k] = jax.device_put(jnp.asarray(np.asarray(v)),
                                         self.device)
        return data


class AddRandomMetaPaths(BaseTransform):
    """Sampled metapath edges (reference
    ``add_metapaths.py:AddRandomMetaPaths``): random-walk along each
    metapath instead of exact sparse products."""

    def __init__(self, metapaths, sample_ratio: float = 1.0,
                 walks_per_node: int = 1, seed: int = 0):
        self.metapaths = metapaths
        self.sample_ratio = sample_ratio
        self.walks_per_node = walks_per_node
        self.rng = np.random.default_rng(seed)

    def __call__(self, data):
        for j, mp in enumerate(self.metapaths):
            src_t = mp[0][0]
            dst_t = mp[-1][-1]
            n0 = data[src_t].num_nodes
            start = np.nonzero(
                self.rng.random(n0) < self.sample_ratio)[0]
            start = np.repeat(start, self.walks_per_node)
            cur = start.copy()
            alive = np.ones(len(cur), bool)
            for et in mp:
                et = (et[0], 'to', et[1]) if len(et) == 2 else tuple(et)
                coo = np.asarray(data[et].edge_index)
                n_dst = data[et[0]].num_nodes
                order = np.argsort(coo[0], kind='stable')
                rowptr = np.searchsorted(coo[0][order],
                                         np.arange(n_dst + 1))
                col = coo[1][order]
                lo = rowptr[np.minimum(cur, n_dst - 1)]
                deg = rowptr[np.minimum(cur, n_dst - 1) + 1] - lo
                alive = alive & (deg > 0)
                pick = np.minimum(
                    lo + self.rng.integers(0, 2 ** 31, len(cur))
                    % np.maximum(deg, 1), max(len(col) - 1, 0))
                cur = np.where(alive, col[pick], cur)
            ei = np.stack([start[alive], cur[alive]])
            data[(src_t, f'metapath_{j}', dst_t)].edge_index = ei
        return data


class ToSLIC(BaseTransform):
    """Image -> SLIC superpixel graph (reference ``to_superpixels.py``;
    skimage-gated like the reference's optional dep)."""

    def __init__(self, add_seg: bool = False, add_img: bool = False,
                 **slic_kwargs):
        self.add_seg, self.add_img = add_seg, add_img
        self.slic_kwargs = slic_kwargs

    def __call__(self, img):
        try:
            from skimage.segmentation import slic
        except ImportError as e:  # pragma: no cover
            raise ImportError('ToSLIC requires scikit-image') from e
        img = np.asarray(img)
        seg = slic(img, **self.slic_kwargs)
        k = int(seg.max()) + 1
        pos = np.zeros((k, 2))
        x = np.zeros((k, img.shape[-1] if img.ndim == 3 else 1))
        for s in range(k):
            ys, xs = np.nonzero(seg == s)
            pos[s] = [xs.mean(), ys.mean()]
            x[s] = img[ys, xs].reshape(len(ys), -1).mean(0)
        d = Data(x=x.astype(np.float32),
                 pos=pos.astype(np.float32), num_nodes=k)
        if self.add_seg:
            d.seg = seg
        if self.add_img:
            d.img = img
        return d
