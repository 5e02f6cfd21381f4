"""Transforms tests (mirrors reference test/transforms/)."""
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_geometric_tpu.transforms as T
from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.edge_index import EdgeIndex

rng = np.random.default_rng(0)


def make_data(n=10, e=30, f=4):
    return Data(
        x=rng.standard_normal((n, f)).astype(np.float32),
        edge_index=np.stack([rng.integers(0, n, e),
                             rng.integers(0, n, e)]).astype(np.int32),
        y=rng.integers(0, 3, n),
        pos=rng.standard_normal((n, 3)).astype(np.float32),
        num_nodes=n,
    )


def test_compose_and_to_undirected():
    data = make_data()
    out = T.Compose([T.ToUndirected()])(data)
    coo = np.asarray(out.edge_index)
    fwd = set(map(tuple, coo.T))
    assert all((d, s) in fwd for s, d in coo.T)


def test_self_loops_transforms():
    data = make_data()
    n = data.num_nodes
    e = data.num_edges
    out = T.AddSelfLoops()(data)
    assert out.num_edges == e + n
    out2 = T.RemoveSelfLoops()(out)
    coo = np.asarray(out2.edge_index)
    assert (coo[0] != coo[1]).all()


def test_remove_isolated_and_duplicates():
    coo = np.array([[0, 0, 1], [1, 1, 3]], np.int32)
    data = Data(x=np.eye(5, dtype=np.float32), edge_index=coo, num_nodes=5)
    out = T.RemoveDuplicatedEdges()(data)
    assert out.num_edges == 2
    out = T.RemoveIsolatedNodes()(data)
    assert out.num_nodes == 3  # nodes 2, 4 dropped


def test_two_hop_virtual_line():
    coo = np.array([[0, 1], [1, 2]], np.int32)
    data = Data(x=np.eye(3, dtype=np.float32), edge_index=coo, num_nodes=3)
    out = T.TwoHop()(data)
    pairs = set(map(tuple, np.asarray(out.edge_index).T))
    assert (0, 2) in pairs
    out = T.VirtualNode()(data)
    assert out.num_nodes == 4
    assert out.num_edges == 2 + 6
    out = T.LineGraph()(data)
    assert out.num_nodes == 2
    assert np.asarray(out.edge_index).shape[1] == 1  # e0 -> e1


def test_gcn_norm_sign_sparse():
    data = make_data()
    out = T.GCNNorm()(data)
    assert out.edge_weight is not None
    out = T.SIGN(K=2)(data)
    assert out.x1.shape == data.x.shape and out.x2 is not None
    out = T.ToSparseTensor()(data)
    assert isinstance(out.edge_index, EdgeIndex)
    assert out.edge_index.csr is not None


def test_pad():
    data = make_data(n=10, e=30)
    out = T.Pad(max_num_nodes=16, max_num_edges=40)(data)
    assert out.num_nodes == 16
    assert out.x.shape == (16, 4)
    assert out.edge_index.coo.shape == (2, 40)
    assert int(np.asarray(out.node_mask).sum()) == 10
    assert int(np.asarray(out.edge_mask).sum()) == 30
    # padded edges point at the dump row
    assert (np.asarray(out.edge_index.coo)[:, 30:] == 16).all()


def test_feature_transforms():
    data = make_data()
    out = T.NormalizeFeatures()(data)
    s = np.asarray(out.x).sum(-1)
    ok = np.isclose(s, 1, atol=1e-5) | np.isclose(s, 0, atol=1e-6)
    assert ok.all()
    out = T.SVDFeatureReduction(out_channels=2)(data)
    assert out.x.shape == (10, 2)
    out = T.Constant()(data)
    assert out.x.shape == (10, 5)
    out = T.OneHotDegree(max_degree=5)(data)
    assert out.x.shape[1] == 4 + 6
    out = T.TargetIndegree()(data)
    assert out.edge_attr.shape == (30, 1)
    out = T.LocalDegreeProfile()(data)
    assert out.x.shape[1] == 4 + 5


def test_positional_encodings():
    data = make_data()
    out = T.AddLaplacianEigenvectorPE(k=3)(data)
    assert out.laplacian_eigenvector_pe.shape == (10, 3)
    out = T.AddRandomWalkPE(walk_length=4)(data)
    pe = np.asarray(out.random_walk_pe)
    assert pe.shape == (10, 4)
    assert (pe >= -1e-6).all() and (pe <= 1 + 1e-6).all()


def test_feature_propagation():
    data = make_data()
    x = np.asarray(data.x).copy()
    miss = rng.random(x.shape) < 0.3
    x[miss] = np.nan
    data = data.replace(x=x, missing_mask=miss)
    out = T.FeaturePropagation(num_iterations=10)(data)
    assert np.isfinite(np.asarray(out.x)).all()
    # known entries unchanged
    known = ~miss
    np.testing.assert_allclose(np.asarray(out.x)[known],
                               np.nan_to_num(x)[known], rtol=1e-5)


def test_geometric_transforms():
    data = make_data()
    out = T.Center()(data)
    np.testing.assert_allclose(np.asarray(out.pos).mean(0), 0, atol=1e-5)
    out = T.NormalizeScale()(data)
    assert np.abs(np.asarray(out.pos)).max() <= 1.0
    out = T.KNNGraph(k=3)(data)
    assert out.num_edges == 30
    out = T.RadiusGraph(r=1.5)(data)
    coo = np.asarray(out.edge_index)
    pos = np.asarray(data.pos)
    if coo.size:
        d = np.linalg.norm(pos[coo[0]] - pos[coo[1]], axis=-1)
        assert (d <= 1.5 + 1e-5).all()
    for t in (T.Distance(), T.Cartesian(), T.Polar(), T.Spherical()):
        out = t(make_data())
        assert out.edge_attr is not None
    for t in (T.RandomJitter(0.1, seed=0), T.RandomFlip(0, seed=0),
              T.RandomRotate(30, seed=0), T.RandomScale((0.9, 1.1),
                                                        seed=0),
              T.RandomShear(0.1, seed=0)):
        out = t(make_data())
        assert out.pos.shape == (10, 3)


def test_sample_points_and_grid():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                   np.float32)
    face = np.array([[0, 1], [1, 2], [2, 3]], np.int64).T.reshape(3, -1)
    face = np.array([[0, 1, 2], [1, 2, 3]], np.int64).T
    data = Data(pos=pos, face=face, num_nodes=4)
    out = T.SamplePoints(num=32, include_normals=True, seed=0)(data)
    assert out.pos.shape == (32, 3)
    assert out.normal.shape == (32, 3)

    data = make_data()
    out = T.GridSampling(size=1.0)(data)
    assert out.num_nodes <= data.num_nodes


def test_face_to_edge():
    face = np.array([[0, 1, 2]], np.int64).T
    data = Data(pos=np.zeros((3, 3), np.float32), face=face, num_nodes=3)
    out = T.FaceToEdge()(data)
    pairs = set(map(tuple, np.asarray(out.edge_index).T))
    assert (0, 1) in pairs and (1, 0) in pairs and (2, 0) in pairs


def test_node_split():
    data = make_data(n=50)
    out = T.RandomNodeSplit(num_val=0.2, num_test=0.2, seed=0)(data)
    tm = np.asarray(out.train_mask)
    vm = np.asarray(out.val_mask)
    sm = np.asarray(out.test_mask)
    assert tm.sum() + vm.sum() + sm.sum() == 50
    assert not (tm & vm).any() and not (tm & sm).any()


def test_link_split():
    data = make_data(n=20, e=60)
    data = T.RemoveDuplicatedEdges()(data)  # duplicate edges would leak
    train, val, test = T.RandomLinkSplit(num_val=0.1, num_test=0.2,
                                         seed=0)(data)
    assert train.edge_label_index is not None
    lbl = np.asarray(val.edge_label)
    assert (lbl == 1).sum() > 0 and (lbl == 0).sum() > 0
    # supervision edges of val are not in train message edges
    tr = set(map(tuple, np.asarray(train.edge_index).T))
    vl = np.asarray(val.edge_label_index)[:, lbl == 1]
    assert all((s, d) not in tr for s, d in vl.T)


def test_index_mask_roundtrip():
    data = make_data().replace(train_index=np.array([1, 3, 5]))
    out = T.IndexToMask(attrs=('train_index',))(data)
    assert np.asarray(out.train_mask).sum() == 3
    back = T.MaskToIndex(attrs=('train_mask',))(out)
    np.testing.assert_array_equal(np.asarray(back.train_index), [1, 3, 5])


def test_gdc():
    data = make_data()
    out = T.GDC(diffusion_kwargs={'method': 'ppr', 'alpha': 0.2},
                sparsification_kwargs={'method': 'threshold',
                                       'eps': 1e-3})(data)
    assert out.edge_attr is not None
    w = np.asarray(out.edge_attr)
    assert (w > 0).all()
    # column-normalised
    coo = np.asarray(out.edge_index)
    sums = np.zeros(10)
    np.add.at(sums, coo[1], w)
    np.testing.assert_allclose(sums[sums > 0], 1.0, atol=1e-5)

    out = T.GDC(diffusion_kwargs={'method': 'heat', 't': 3.0},
                sparsification_kwargs={'method': 'topk', 'k': 4})(data)
    assert out.num_edges > 0


def test_add_metapaths():
    from pytorch_geometric_tpu.data.hetero_data import HeteroData
    h = HeteroData()
    h['a'].x = rng.standard_normal((4, 3)).astype(np.float32)
    h['b'].x = rng.standard_normal((5, 3)).astype(np.float32)
    h['a', 'ab', 'b'].edge_index = np.array([[0, 1, 2], [0, 1, 2]],
                                            np.int32)
    h['b', 'ba', 'a'].edge_index = np.array([[0, 1, 2], [1, 2, 3]],
                                            np.int32)
    out = T.AddMetaPaths([[('a', 'ab', 'b'), ('b', 'ba', 'a')]])(h)
    mp = ('a', 'metapath_0', 'a')
    assert mp in out.edge_types
    coo = np.asarray(out[mp].edge_index)
    assert set(map(tuple, coo.T)) == {(0, 1), (1, 2), (2, 3)}


def test_rooted_ego_nets_and_halfhop():
    coo = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    data = Data(x=np.eye(4, dtype=np.float32), edge_index=coo,
                num_nodes=4)
    out = T.RootedEgoNets(num_hops=1)(data)
    roots = np.asarray(out.sub_root)
    members = np.asarray(out.sub_node_index)
    # node 1's 1-hop ego net contains its in-neighbor 0 and itself
    assert set(members[roots == 1].tolist()) == {0, 1}

    out = T.HalfHop(alpha=0.5, p=1.0, seed=0)(data)
    assert out.num_nodes == 4 + 3
    assert int(np.asarray(out.slow_node_mask).sum()) == 3
    # slow node features = midpoint
    x = np.asarray(out.x)
    np.testing.assert_allclose(x[4], 0.5 * (x[0] + x[1]), atol=1e-6)
