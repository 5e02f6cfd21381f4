"""Transforms parity wave 3 vs the reference PyG oracle.

Deterministic transforms only: Pad, NodePropertySplit (property order +
OOD masks; the reference shuffles inside the ID region),
AddRemainingSelfLoops, RemoveSelfLoops, RemoveIsolatedNodes,
RemoveDuplicatedEdges, ComposeFilters. Randomized geometric transforms
(RandomJitter/Rotate/…, SamplePoints, FixedPoints, RandomLink/NodeSplit,
RootedRWSubgraph, AddRandomMetaPaths) draw from torch's global RNG and
cannot be seed-matched; KNN/RadiusGraph/ToSLIC need torch-cluster /
scikit-image (absent here).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.transforms as RT
from torch_geometric.data import Data as RefData

import jax.numpy as jnp

import pytorch_geometric_tpu.transforms as T
from pytorch_geometric_tpu.data import Data

rng = np.random.default_rng(13)
N, F, E = 12, 5, 30
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
W = rng.uniform(0.5, 2.0, E).astype(np.float32)


def pair():
    rdata = RefData(x=torch.from_numpy(X.copy()),
                    edge_index=torch.from_numpy(COO.copy()),
                    edge_weight=torch.from_numpy(W.copy()))
    data = Data(x=jnp.asarray(X), edge_index=jnp.asarray(
        COO.astype(np.int32)), edge_weight=jnp.asarray(W), num_nodes=N)
    return rdata, data


def _edge_map(coo, w):
    out = {}
    for (s, d), v in zip(np.asarray(coo).T.tolist(), np.asarray(w)):
        out[(s, d)] = out.get((s, d), 0.0) + float(v)
    return out


def test_add_remaining_self_loops():
    rdata, data = pair()
    r = RT.AddRemainingSelfLoops(attr='edge_weight', fill_value=2.5)(rdata)
    o = T.AddRemainingSelfLoops(attr='edge_weight', fill_value=2.5)(data)
    assert _edge_map(o.edge_index, o.edge_weight) == pytest.approx(
        _edge_map(r.edge_index.numpy(), r.edge_weight.numpy()))


def test_remove_self_loops():
    coo = COO.copy()
    coo[1, :4] = coo[0, :4]   # force some loops
    rdata = RefData(x=torch.from_numpy(X.copy()),
                    edge_index=torch.from_numpy(coo),
                    edge_weight=torch.from_numpy(W.copy()))
    data = Data(x=jnp.asarray(X), edge_index=jnp.asarray(
        coo.astype(np.int32)), edge_weight=jnp.asarray(W), num_nodes=N)
    r = RT.RemoveSelfLoops(attr='edge_weight')(rdata)
    o = T.RemoveSelfLoops()(data)
    np.testing.assert_array_equal(np.asarray(o.edge_index),
                                  r.edge_index.numpy())
    np.testing.assert_allclose(np.asarray(o.edge_weight),
                               r.edge_weight.numpy())


def test_remove_isolated_nodes():
    # leave nodes 0 and 7 isolated
    coo = COO.copy()
    coo[coo == 0] = 1
    coo[coo == 7] = 8
    rdata = RefData(x=torch.from_numpy(X.copy()),
                    edge_index=torch.from_numpy(coo), num_nodes=N)
    data = Data(x=jnp.asarray(X), edge_index=jnp.asarray(
        coo.astype(np.int32)), num_nodes=N)
    r = RT.RemoveIsolatedNodes()(rdata)
    o = T.RemoveIsolatedNodes()(data)
    assert o.num_nodes == r.num_nodes
    np.testing.assert_array_equal(np.asarray(o.edge_index),
                                  r.edge_index.numpy())
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy())


def test_remove_duplicated_edges():
    rdata, data = pair()
    r = RT.RemoveDuplicatedEdges(key='edge_weight', reduce='add')(rdata)
    o = T.RemoveDuplicatedEdges(reduce='add')(data)
    assert _edge_map(o.edge_index, o.edge_weight) == pytest.approx(
        _edge_map(r.edge_index.numpy(), r.edge_weight.numpy()))
    assert o.edge_index.shape == tuple(r.edge_index.shape)


def test_pad():
    rdata, data = pair()
    del rdata.edge_weight
    ea = rng.standard_normal((E, 3)).astype(np.float32)
    rdata.edge_attr = torch.from_numpy(ea.copy())
    data = data.replace(edge_weight=None, edge_attr=jnp.asarray(ea))
    r = RT.Pad(max_num_nodes=20, max_num_edges=40, node_pad_value=7.0,
               edge_pad_value=-1.0)(rdata)
    o = T.Pad(max_num_nodes=20, max_num_edges=40, node_pad_value=7.0,
              edge_pad_value=-1.0)(data)
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy())
    np.testing.assert_allclose(np.asarray(o.edge_attr),
                               r.edge_attr.numpy())
    # real edges agree; padded edges differ by convention (reference
    # wires them between pad nodes, ours point at the sentinel row)
    np.testing.assert_array_equal(np.asarray(o.edge_index.coo)[:, :E],
                                  r.edge_index.numpy()[:, :E])
    assert o.num_nodes == r.num_nodes == 20


@pytest.mark.parametrize('prop', ['popularity', 'locality', 'density'])
def test_node_property_split(prop):
    # bigger connected-ish graph so pagerank orders are stable
    rng2 = np.random.default_rng(17)
    n, e = 40, 160
    coo = np.stack([rng2.integers(0, n, e), rng2.integers(0, n, e)])
    ratios = [0.3, 0.1, 0.1, 0.2, 0.3]
    rdata = RefData(edge_index=torch.from_numpy(coo), num_nodes=n)
    data = Data(edge_index=jnp.asarray(coo.astype(np.int32)), num_nodes=n)
    torch.manual_seed(0)
    r = RT.NodePropertySplit(prop, ratios)(rdata)
    o = T.NodePropertySplit(prop, ratios)(data)
    names = ['id_train_mask', 'id_val_mask', 'id_test_mask',
             'ood_val_mask', 'ood_test_mask']
    for nm in names:
        assert int(np.asarray(o[nm]).sum()) == int(r[nm].sum()), nm
    # ID region (union of first three) is deterministic; OOD masks exact
    id_ours = (np.asarray(o['id_train_mask']) | np.asarray(o['id_val_mask'])
               | np.asarray(o['id_test_mask']))
    id_ref = (r['id_train_mask'] | r['id_val_mask']
              | r['id_test_mask']).numpy()
    np.testing.assert_array_equal(id_ours, id_ref)
    np.testing.assert_array_equal(np.asarray(o['ood_val_mask']),
                                  r['ood_val_mask'].numpy())
    np.testing.assert_array_equal(np.asarray(o['ood_test_mask']),
                                  r['ood_test_mask'].numpy())


def test_compose_filters():
    f1 = lambda d: d.num_nodes > 5
    f2 = lambda d: int(np.asarray(d.edge_index).shape[1]) < 100
    _, data = pair()
    assert T.ComposeFilters([f1, f2])(data) is True
    assert T.ComposeFilters([f1, lambda d: False])(data) is False
