"""Utils parity vs the reference PyG oracle — deterministic graph
utilities compared on identical inputs."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.utils as RU

import jax.numpy as jnp

import pytorch_geometric_tpu.utils as U

rng = np.random.default_rng(4)
N, E, F = 15, 40, 5
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)
W = rng.random(E).astype(np.float32)
Y = rng.integers(0, 3, N)


def t(x):
    return torch.from_numpy(np.asarray(x)).contiguous()


def sort_edges(coo, w=None):
    coo = np.asarray(coo)
    order = np.lexsort((coo[1], coo[0]))
    if w is None:
        return coo[:, order]
    return coo[:, order], np.asarray(w)[order]


def test_coalesce():
    rc, rw = RU.coalesce(t(COO), t(W), num_nodes=N)
    oc, ow = U.coalesce(COO, W, num_nodes=N)
    a, wa = sort_edges(oc, ow)
    b, wb = sort_edges(rc.numpy(), rw.numpy())
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(wa, wb, rtol=1e-6)


def test_to_undirected_degree():
    rc = RU.to_undirected(t(COO), num_nodes=N)
    oc = U.to_undirected(COO, num_nodes=N)
    np.testing.assert_array_equal(sort_edges(oc), sort_edges(rc.numpy()))

    rd = RU.degree(t(COO[1]), num_nodes=N)
    od = U.degree(COO[1], num_nodes=N)
    np.testing.assert_allclose(np.asarray(od), rd.numpy())


def test_k_hop_subgraph():
    subset_r, ei_r, map_r, mask_r = RU.k_hop_subgraph(
        torch.tensor([0, 3]), 2, t(COO), num_nodes=N)
    subset_o, ei_o, map_o, mask_o = U.k_hop_subgraph(
        np.array([0, 3]), 2, COO, num_nodes=N)
    np.testing.assert_array_equal(np.sort(np.asarray(subset_o)),
                                  np.sort(subset_r.numpy()))
    np.testing.assert_array_equal(np.asarray(mask_o),
                                  mask_r.numpy())


def test_subgraph():
    keep = np.sort(rng.choice(N, 8, replace=False))
    ei_r, w_r = RU.subgraph(t(keep), t(COO), t(W), num_nodes=N)
    ei_o, w_o, _ = U.subgraph(keep, COO, W, num_nodes=N)
    a, wa = sort_edges(ei_o, w_o)
    b, wb = sort_edges(ei_r.numpy(), w_r.numpy())
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(wa, wb)


def test_to_dense_batch_adj():
    batch = np.sort(rng.integers(0, 3, N))
    rd, rm = RU.to_dense_batch(t(X), t(batch))
    od, om = U.to_dense_batch(jnp.asarray(X), jnp.asarray(batch),
                              batch_size=3,
                              max_num_nodes=int(np.bincount(batch).max()))
    np.testing.assert_allclose(np.asarray(od), rd.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(om), rm.numpy())

    ra = RU.to_dense_adj(t(COO), t(batch), t(W))
    mx = int(np.bincount(batch).max())
    oa = U.to_dense_adj(COO, jnp.asarray(batch), 3, mx,
                        edge_attr=jnp.asarray(W))
    ra = ra.numpy()
    oa = np.asarray(oa)[:, :ra.shape[1], :ra.shape[2]]
    np.testing.assert_allclose(oa, ra, atol=1e-6)


def test_homophily_assortativity():
    for method in ('edge', 'node'):
        r = RU.homophily(t(COO), t(Y), method=method)
        o = U.homophily(COO, Y, method=method)
        assert abs(float(o) - float(r)) < 1e-5, method
    r = RU.assortativity(t(COO))
    o = U.assortativity(COO)
    assert abs(float(o) - float(r)) < 1e-4


def test_get_laplacian():
    for norm in (None, 'sym', 'rw'):
        rc, rw = RU.get_laplacian(t(COO), t(W), normalization=norm,
                                  num_nodes=N)
        oc, ow = U.get_laplacian(COO, jnp.asarray(W), normalization=norm,
                                 num_nodes=N)
        # compare aggregated dense laplacians (slot layouts differ)
        a = np.zeros((N, N))
        np.add.at(a, (np.asarray(oc)[0], np.asarray(oc)[1]),
                  np.asarray(ow))
        b = np.zeros((N, N))
        np.add.at(b, (rc.numpy()[0], rc.numpy()[1]), rw.numpy())
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=str(norm))


def test_softmax_grouped():
    src = jnp.asarray(rng.standard_normal(E).astype(np.float32))
    r = RU.softmax(t(np.asarray(src)), t(COO[1]), num_nodes=N)
    o = U.softmax(src, jnp.asarray(COO[1]), N)
    np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=1e-6)


def test_dense_to_sparse_and_back():
    adj = np.zeros((N, N), np.float32)
    adj[COO[0], COO[1]] = W
    rc, rw = RU.dense_to_sparse(t(adj))
    oc, ow = U.dense_to_sparse(jnp.asarray(adj))
    a, wa = sort_edges(oc, ow)
    b, wb = sort_edges(rc.numpy(), rw.numpy())
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(wa, wb)


def test_normalized_cut():
    r = RU.normalized_cut(t(COO), t(W), num_nodes=N)
    o = U.normalized_cut(COO, jnp.asarray(W), N)
    np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-5)


def test_one_hot_cumsum_lexsort():
    r = RU.one_hot(t(Y))
    o = U.one_hot(jnp.asarray(Y), int(Y.max()) + 1)
    np.testing.assert_array_equal(np.asarray(o), r.numpy())
    r = RU.cumsum(t(W))
    o = U.cumsum(jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=1e-6)
    keys = [rng.integers(0, 4, 20), rng.integers(0, 4, 20)]
    r = RU.lexsort([t(k) for k in keys])
    o = U.lexsort([jnp.asarray(k) for k in keys])
    np.testing.assert_array_equal(np.asarray(o), r.numpy())


def test_map_index():
    src = rng.integers(0, 100, 30)
    index = np.unique(rng.choice(src, 20))
    from torch_geometric.utils.map import map_index as ref_map_index
    r_out, r_mask = ref_map_index(t(src), t(index), inclusive=False)
    o_out, o_mask = U.map_index(src, index, inclusive=False)
    np.testing.assert_array_equal(np.asarray(o_mask), r_mask.numpy())
    np.testing.assert_array_equal(np.asarray(o_out), r_out.numpy())


def test_is_undirected_contains():
    und = np.concatenate([COO, COO[::-1]], 1)
    assert bool(U.is_undirected(und)) == bool(RU.is_undirected(t(und)))
    assert bool(U.is_undirected(COO)) == bool(RU.is_undirected(t(COO)))
    assert (bool(U.contains_self_loops(COO))
            == bool(RU.contains_self_loops(t(COO))))
    assert (bool(U.contains_isolated_nodes(COO, num_nodes=N))
            == bool(RU.contains_isolated_nodes(t(COO), num_nodes=N)))
