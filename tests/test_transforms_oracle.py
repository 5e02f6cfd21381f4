"""Transforms parity vs the reference PyG oracle — deterministic
transforms compared on identical inputs (edge sets compared order-
insensitively; eigen/SVD features up to sign)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.transforms as RT
from torch_geometric.data import Data as RefData

import pytorch_geometric_tpu.transforms as T
from pytorch_geometric_tpu.data import Data

rng = np.random.default_rng(3)
N, E, F = 12, 30, 6
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.unique(np.stack([rng.integers(0, N, E),
                          rng.integers(0, N, E)]), axis=1)
W = rng.random(COO.shape[1]).astype(np.float32)
POS = rng.standard_normal((N, 3)).astype(np.float32)


def ours(**kw):
    return Data(num_nodes=N, **kw)


def refd(**kw):
    return RefData(num_nodes=N,
                   **{k: torch.from_numpy(np.asarray(v)).contiguous()
                      for k, v in kw.items()})


def edge_set(coo, attr=None):
    coo = np.asarray(coo)
    order = np.lexsort((coo[1], coo[0]))
    out = coo[:, order]
    if attr is None:
        return out, None
    return out, np.asarray(attr)[order]


def assert_same_edges(a, b, wa=None, wb=None, atol=1e-5):
    ea, va = edge_set(a, wa)
    eb, vb = edge_set(b, wb)
    np.testing.assert_array_equal(ea, eb)
    if va is not None:
        np.testing.assert_allclose(va, vb, atol=atol, rtol=1e-5)


def _coo(d):
    ei = d.edge_index
    return np.asarray(getattr(ei, 'coo', ei))


def test_to_undirected_and_self_loops():
    r = RT.ToUndirected()(refd(x=X, edge_index=COO))
    o = T.ToUndirected()(ours(x=X, edge_index=COO))
    assert_same_edges(_coo(o), r.edge_index.numpy())

    r = RT.AddSelfLoops()(refd(x=X, edge_index=COO))
    o = T.AddSelfLoops()(ours(x=X, edge_index=COO))
    assert_same_edges(_coo(o), r.edge_index.numpy())


def test_two_hop():
    r = RT.TwoHop()(refd(x=X, edge_index=COO))
    o = T.TwoHop()(ours(x=X, edge_index=COO))
    assert_same_edges(_coo(o), r.edge_index.numpy())


def dense_adj(coo, w, n=N):
    a = np.zeros((n, n))
    np.add.at(a, (coo[0], coo[1]), np.asarray(w))
    return a


def test_gcn_norm():
    r = RT.GCNNorm()(refd(x=X, edge_index=COO, edge_weight=W))
    o = T.GCNNorm()(ours(x=X, edge_index=COO, edge_weight=W))
    # ours keeps zero-weight duplicate loop slots (static shapes):
    # compare the aggregated adjacency, which is what every consumer
    # (spmm/propagate) sees
    np.testing.assert_allclose(
        dense_adj(_coo(o), np.asarray(o.edge_weight)),
        dense_adj(r.edge_index.numpy(), r.edge_weight.numpy()),
        atol=1e-5)


def test_sign():
    r = RT.SIGN(K=2)(refd(x=X, edge_index=COO))
    o = T.SIGN(K=2)(ours(x=X, edge_index=COO))
    for k in (1, 2):
        np.testing.assert_allclose(np.asarray(getattr(o, f'x{k}')),
                                   getattr(r, f'x{k}').numpy(),
                                   atol=1e-5, rtol=1e-4)


def test_normalize_and_degree_features():
    r = RT.NormalizeFeatures()(refd(x=np.abs(X), edge_index=COO))
    o = T.NormalizeFeatures()(ours(x=np.abs(X), edge_index=COO))
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy(), atol=1e-6)

    r = RT.OneHotDegree(max_degree=8)(refd(x=X, edge_index=COO))
    o = T.OneHotDegree(max_degree=8)(ours(x=X, edge_index=COO))
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy(), atol=1e-6)

    r = RT.LocalDegreeProfile()(refd(x=X, edge_index=COO))
    o = T.LocalDegreeProfile()(ours(x=X, edge_index=COO))
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy(), atol=1e-4)


def test_target_indegree():
    r = RT.TargetIndegree()(refd(x=X, edge_index=COO))
    o = T.TargetIndegree()(ours(x=X, edge_index=COO))
    assert_same_edges(_coo(o), r.edge_index.numpy(),
                      np.asarray(o.edge_attr).reshape(-1),
                      r.edge_attr.numpy().reshape(-1))


def test_geometric_edge_attrs():
    for RC, OC in ((RT.Distance, T.Distance),
                   (RT.Cartesian, T.Cartesian),
                   (RT.Polar, T.Polar), (RT.Spherical, T.Spherical)):
        if RC in (RT.Polar,):
            pos = POS[:, :2]
        else:
            pos = POS
        r = RC()(refd(pos=pos, edge_index=COO))
        o = OC()(ours(pos=pos, edge_index=COO))
        # the reference emits nan for zero-length (self-loop) edges in
        # Spherical (acos(0/0)); compare finite entries
        ra = r.edge_attr.numpy()
        oa = np.asarray(o.edge_attr)
        finite = np.isfinite(ra)
        np.testing.assert_allclose(oa[finite], ra[finite], atol=1e-5)


def test_laplacian_eigenvector_pe():
    # connected-ish graph for stable spectra
    ring = np.stack([np.arange(N), (np.arange(N) + 1) % N])
    coo = np.concatenate([COO, ring, ring[::-1]], 1)
    r = RT.AddLaplacianEigenvectorPE(k=3, is_undirected=False)(
        refd(x=X, edge_index=coo))
    o = T.AddLaplacianEigenvectorPE(k=3)(ours(x=X, edge_index=coo))
    a = np.abs(np.asarray(o.laplacian_eigenvector_pe))
    b = np.abs(r.laplacian_eigenvector_pe.numpy())
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_random_walk_pe():
    r = RT.AddRandomWalkPE(walk_length=4)(refd(x=X, edge_index=COO))
    o = T.AddRandomWalkPE(walk_length=4)(ours(x=X, edge_index=COO))
    np.testing.assert_allclose(np.asarray(o.random_walk_pe),
                               r.random_walk_pe.numpy(), atol=1e-5)


def test_virtual_node():
    r = RT.VirtualNode()(refd(x=X, edge_index=COO))
    o = T.VirtualNode()(ours(x=X, edge_index=COO))
    assert o.num_nodes == r.num_nodes
    assert_same_edges(_coo(o), r.edge_index.numpy())


def test_face_to_edge():
    face = rng.integers(0, N, (3, 10))
    r = RT.FaceToEdge()(refd(pos=POS, face=face))
    o = T.FaceToEdge()(ours(pos=POS, face=face))
    assert_same_edges(_coo(o), r.edge_index.numpy())


def test_gdc():
    r = RT.GDC(self_loop_weight=1.0, normalization_in='sym',
               normalization_out='col',
               diffusion_kwargs=dict(method='ppr', alpha=0.15),
               sparsification_kwargs=dict(method='threshold',
                                          avg_degree=4))(
        refd(x=X, edge_index=COO))
    o = T.GDC(self_loop_weight=1.0, normalization_in='sym',
              normalization_out='col',
              diffusion_kwargs=dict(method='ppr', alpha=0.15),
              sparsification_kwargs=dict(method='threshold',
                                         avg_degree=4))(
        ours(x=X, edge_index=COO))
    assert_same_edges(_coo(o), r.edge_index.numpy(),
                      np.asarray(o.edge_attr).reshape(-1),
                      r.edge_attr.numpy().reshape(-1), atol=1e-4)
