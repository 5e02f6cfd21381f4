"""Transforms parity wave 2 vs the reference PyG oracle."""
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

rng = np.random.default_rng(4)
N, E, F = 12, 30, 6
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.unique(np.stack([rng.integers(0, N, E),
                          rng.integers(0, N, E)]), axis=1)
POS = rng.standard_normal((N, 3)).astype(np.float32)
Y = rng.integers(0, 3, N)


def ours(**kw):
    return Data(num_nodes=N, **kw)


def refd(**kw):
    return RefData(num_nodes=N,
                   **{k: torch.from_numpy(np.asarray(v)).contiguous()
                      for k, v in kw.items()})


def _coo(d):
    ei = d.edge_index
    return np.asarray(getattr(ei, 'coo', ei))


def edge_set(coo, attr=None):
    coo = np.asarray(coo)
    order = np.lexsort((coo[1], coo[0]))
    if attr is None:
        return coo[:, order], None
    return coo[:, order], np.asarray(attr)[order]


def assert_same_edges(a, b, wa=None, wb=None, atol=1e-5):
    ea, va = edge_set(a, wa)
    eb, vb = edge_set(b, wb)
    np.testing.assert_array_equal(ea, eb)
    if va is not None:
        np.testing.assert_allclose(va, vb, atol=atol, rtol=1e-4)


def test_center_and_normalize_scale():
    r = RT.Center()(refd(pos=POS))
    g = T.Center()(ours(pos=POS))
    np.testing.assert_allclose(np.asarray(g.pos), r.pos.numpy(),
                               rtol=1e-5, atol=1e-6)
    r = RT.NormalizeScale()(refd(pos=POS))
    g = T.NormalizeScale()(ours(pos=POS))
    np.testing.assert_allclose(np.asarray(g.pos), r.pos.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_constant():
    r = RT.Constant(value=2.5)(refd(x=X, edge_index=COO))
    g = T.Constant(value=2.5)(ours(x=X, edge_index=COO))
    np.testing.assert_allclose(np.asarray(g.x), r.x.numpy(), rtol=1e-6)


def test_index_mask_transforms():
    train = rng.random(N) < 0.5
    r = RT.MaskToIndex()(refd(train_mask=train))
    g = T.MaskToIndex()(ours(train_mask=train))
    np.testing.assert_array_equal(np.asarray(g.train_index),
                                  r.train_index.numpy())
    idx = np.where(train)[0]
    r = RT.IndexToMask(sizes=N)(refd(train_index=idx))
    g = T.IndexToMask(sizes=N)(ours(train_index=idx))
    np.testing.assert_array_equal(np.asarray(g.train_mask),
                                  r.train_mask.numpy())


def test_delaunay_and_mesh_normals():
    pos2 = rng.random((10, 2)).astype(np.float32)
    rd = RT.Delaunay()(RefData(pos=torch.from_numpy(pos2)))
    gd = T.Delaunay()(Data(pos=pos2, num_nodes=10))
    # face sets equal up to ordering
    rf = {tuple(sorted(c)) for c in rd.face.numpy().T.tolist()}
    gf = {tuple(sorted(c)) for c in np.asarray(gd.face).T.tolist()}
    assert rf == gf

    pos3 = rng.random((8, 3)).astype(np.float32)
    face = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4], [4, 5, 6],
                     [5, 6, 7]]).T
    r = RT.GenerateMeshNormals()(
        RefData(pos=torch.from_numpy(pos3),
                face=torch.from_numpy(face).contiguous()))
    g = T.GenerateMeshNormals()(Data(pos=pos3, face=face, num_nodes=8))
    np.testing.assert_allclose(np.asarray(g.norm), r.norm.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_grid_sampling():
    # the reference GridSampling needs torch-cluster (absent); check
    # against a hand-computed voxel-mean spec instead
    pos3 = (rng.random((20, 3)) * 4).astype(np.float32)
    x = rng.standard_normal((20, F)).astype(np.float32)
    g = T.GridSampling(size=1.0)(Data(pos=pos3, x=x, num_nodes=20))
    cell = np.floor((pos3 - pos3.min(0)) / 1.0).astype(np.int64)
    keys = {}
    for i, c in enumerate(map(tuple, cell.tolist())):
        keys.setdefault(c, []).append(i)
    exp_pos = sorted(np.mean(pos3[v], 0).tolist() for v in keys.values())
    got_pos = sorted(np.asarray(g.pos).tolist())
    np.testing.assert_allclose(got_pos, exp_pos, rtol=1e-4, atol=1e-5)


def test_laplacian_lambda_max():
    w = rng.random(COO.shape[1]).astype(np.float32)
    for norm in (None, 'sym', 'rw'):
        r = RT.LaplacianLambdaMax(normalization=norm)(
            refd(edge_index=COO, edge_attr=w))
        g = T.LaplacianLambdaMax(normalization=norm)(
            ours(edge_index=COO, edge_attr=w))
        np.testing.assert_allclose(float(g.lambda_max),
                                   float(r.lambda_max), rtol=1e-3)


def test_largest_connected_components():
    # two components: 0-5 chain and 6-11 chain
    c1 = np.stack([np.arange(4), np.arange(1, 5)])      # 5 nodes
    c2 = np.stack([np.arange(5, 11), np.arange(6, 12)])  # 7 nodes
    coo = np.concatenate([c1, c2, c2[::-1], c1[::-1]], 1)
    r = RT.LargestConnectedComponents(num_components=1)(
        refd(x=X, edge_index=coo))
    g = T.LargestConnectedComponents(num_components=1)(
        ours(x=X, edge_index=coo))
    assert g.num_nodes == r.num_nodes
    np.testing.assert_allclose(np.asarray(g.x), r.x.numpy(), rtol=1e-6)
    assert_same_edges(_coo(g), r.edge_index.numpy())


def test_line_graph():
    coo = np.unique(np.concatenate([COO, COO[::-1]], 1), axis=1)
    r = RT.LineGraph()(refd(edge_index=coo,
                            edge_attr=np.arange(coo.shape[1],
                                                dtype=np.float32)))
    g = T.LineGraph()(ours(edge_index=coo,
                           edge_attr=np.arange(coo.shape[1],
                                               dtype=np.float32)))
    assert g.num_nodes == r.num_nodes
    assert_same_edges(_coo(g), r.edge_index.numpy())


def test_linear_transformation_local_cartesian():
    M = rng.standard_normal((3, 3)).astype(np.float32)
    r = RT.LinearTransformation(torch.from_numpy(M))(refd(pos=POS))
    g = T.LinearTransformation(M)(ours(pos=POS))
    np.testing.assert_allclose(np.asarray(g.pos), r.pos.numpy(),
                               rtol=1e-4, atol=1e-5)

    r = RT.LocalCartesian(norm=True)(refd(pos=POS, edge_index=COO))
    g = T.LocalCartesian(norm=True)(ours(pos=POS, edge_index=COO))
    np.testing.assert_allclose(np.asarray(g.edge_attr),
                               r.edge_attr.numpy(), rtol=1e-4, atol=1e-5)


def test_point_pair_features():
    d_ref = refd(pos=POS, edge_index=COO)
    d_ref.norm = torch.nn.functional.normalize(
        torch.from_numpy(rng.standard_normal((N, 3)).astype(np.float32)))
    norm = d_ref.norm.numpy()
    r = RT.PointPairFeatures()(d_ref)
    g = T.PointPairFeatures()(ours(pos=POS, edge_index=COO, norm=norm))
    np.testing.assert_allclose(np.asarray(g.edge_attr),
                               r.edge_attr.numpy(), rtol=1e-4, atol=1e-5)


def test_remove_duplicated_edges():
    coo = np.concatenate([COO[:, :10], COO[:, :10], COO[:, 10:]], 1)
    w = rng.random(coo.shape[1]).astype(np.float32)
    r = RT.RemoveDuplicatedEdges(reduce='add')(
        refd(edge_index=coo, edge_weight=w))
    g = T.RemoveDuplicatedEdges(reduce='add')(
        ours(edge_index=coo, edge_weight=w))
    assert_same_edges(_coo(g), r.edge_index.numpy(),
                      np.asarray(g.edge_weight), r.edge_weight.numpy())


def test_remove_training_classes():
    train = rng.random(N) < 0.7
    r = RT.RemoveTrainingClasses([0])(
        refd(y=Y, train_mask=train))
    g = T.RemoveTrainingClasses([0])(ours(y=Y, train_mask=train))
    np.testing.assert_array_equal(np.asarray(g.train_mask),
                                  r.train_mask.numpy())


def test_add_metapaths():
    from torch_geometric.data import HeteroData as RefHetero
    from pytorch_geometric_tpu.data import HeteroData
    # sorted + coalesced inputs: the reference's sparse-CSR matmul
    # assumes sorted EdgeIndex rows
    ap = np.unique(np.stack([rng.integers(0, 5, 12),
                             rng.integers(0, 4, 12)]), axis=1)
    pb = np.unique(np.stack([rng.integers(0, 4, 10),
                             rng.integers(0, 6, 10)]), axis=1)
    rd = RefHetero()
    rd['a'].num_nodes = 5
    rd['p'].num_nodes = 4
    rd['b'].num_nodes = 6
    rd[('a', 'to', 'p')].edge_index = \
        torch.from_numpy(np.ascontiguousarray(ap))
    rd[('p', 'to', 'b')].edge_index = \
        torch.from_numpy(np.ascontiguousarray(pb))
    r = RT.AddMetaPaths([[('a', 'to', 'p'), ('p', 'to', 'b')]])(rd)

    gd = HeteroData()
    gd['a'].num_nodes = 5
    gd['p'].num_nodes = 4
    gd['b'].num_nodes = 6
    gd[('a', 'to', 'p')].edge_index = ap
    gd[('p', 'to', 'b')].edge_index = pb
    g = T.AddMetaPaths([[('a', 'to', 'p'), ('p', 'to', 'b')]])(gd)
    rk = ('a', 'metapath_0', 'b')
    assert_same_edges(np.asarray(g[rk].edge_index),
                      r[rk].edge_index.numpy())


def test_to_dense():
    r = RT.ToDense(num_nodes=N)(refd(x=X, edge_index=COO, y=Y))
    g = T.ToDense(num_nodes=N)(ours(x=X, edge_index=COO, y=Y))
    np.testing.assert_allclose(np.asarray(g.adj), r.adj.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.x), r.x.numpy(), rtol=1e-6)


def test_feature_propagation():
    miss = rng.random((N, F)) < 0.3
    x = X.copy()
    r = RT.FeaturePropagation(torch.from_numpy(miss), num_iterations=20)(
        refd(x=x, edge_index=COO))
    g = T.FeaturePropagation(missing_mask=miss, num_iterations=20)(
        ours(x=x, edge_index=COO))
    np.testing.assert_allclose(np.asarray(g.x), r.x.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_compose():
    r = RT.Compose([RT.Center(), RT.NormalizeScale()])(refd(pos=POS))
    g = T.Compose([T.Center(), T.NormalizeScale()])(ours(pos=POS))
    np.testing.assert_allclose(np.asarray(g.pos), r.pos.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_normalize_rotation():
    r = RT.NormalizeRotation()(refd(pos=POS))
    g = T.NormalizeRotation()(ours(pos=POS))
    # eigenvector sign is arbitrary: compare |pos| columns
    np.testing.assert_allclose(np.abs(np.asarray(g.pos)),
                               np.abs(r.pos.numpy()), rtol=1e-3,
                               atol=1e-4)


def test_half_hop():
    x = X.copy()
    r = RT.HalfHop(alpha=0.3, p=1.0)(refd(x=x, edge_index=COO))
    g = T.HalfHop(alpha=0.3, p=1.0)(ours(x=x, edge_index=COO))
    assert np.asarray(g.x).shape == tuple(r.x.shape)
    # compare as canonical edge multisets after matching slow-node ids
    # via their feature rows
    def canon(xv, e):
        xv, e = np.asarray(xv), np.asarray(e)
        keymap = {i: tuple(np.round(xv[i], 4)) for i in range(len(xv))}
        return sorted((keymap[a], keymap[b]) for a, b in e.T.tolist())
    assert canon(g.x, _coo(g)) == canon(r.x.numpy(), r.edge_index.numpy())
    np.testing.assert_allclose(
        np.asarray(g.slow_node_mask if hasattr(g, 'slow_node_mask')
                   else g['slow_node_mask']).sum(),
        r.slow_node_mask.sum().item())


def test_rooted_ego_nets():
    r = RT.RootedEgoNets(num_hops=1)(refd(x=X, edge_index=COO))
    g = T.RootedEgoNets(num_hops=1)(ours(x=X, edge_index=COO))
    # per-root node sets must match
    rn = {}
    for node, root in zip(r.n_id.numpy(), r.n_sub_batch.numpy()):
        rn.setdefault(int(root), set()).add(int(node))
    gn = {}
    for node, root in zip(np.asarray(g.n_id), np.asarray(g.n_sub_batch)):
        gn.setdefault(int(root), set()).add(int(node))
    assert rn == gn
