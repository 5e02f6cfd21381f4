"""Utils oracle wave 2 vs the reference PyG: deterministic graph
utilities not covered by the first utils wave."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
import torch_geometric.utils as tu

import jax.numpy as jnp

import pytorch_geometric_tpu.utils as pu

rng = np.random.default_rng(21)
N, E = 15, 40
COO = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(np.int64)
ATTR = rng.standard_normal((E, 3)).astype(np.float32)


def t(x):
    return torch.from_numpy(np.asarray(x))


def assert_eq(a, b, **kw):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **kw)


def test_index_mask_roundtrip():
    idx = np.unique(rng.integers(0, N, 8))
    r = tu.index_to_mask(t(idx), size=N).numpy()
    g = pu.index_to_mask(jnp.asarray(idx), size=N)
    assert_eq(g, r)
    r2 = tu.mask_to_index(t(r)).numpy()
    g2 = pu.mask_to_index(jnp.asarray(np.asarray(g)))
    assert_eq(g2, r2)
    x = rng.standard_normal((N, 4)).astype(np.float32)
    r3 = tu.mask_select(t(x), 0, t(r)).numpy()
    g3 = pu.mask_select(jnp.asarray(x), 0, jnp.asarray(np.asarray(g)))
    assert_eq(g3, r3)


def test_self_loop_family():
    coo = COO.copy()
    coo[:, :5] = np.stack([np.arange(5), np.arange(5)])  # some loops
    r_attr = tu.get_self_loop_attr(t(coo), t(ATTR), num_nodes=N).numpy()
    g_attr = pu.get_self_loop_attr(jnp.asarray(coo), jnp.asarray(ATTR),
                                   num_nodes=N)
    assert_eq(g_attr, r_attr)

    re, ra, rl, rla = tu.segregate_self_loops(t(coo), t(ATTR))
    ge, ga, gl, gla = pu.segregate_self_loops(np.asarray(coo), ATTR)
    assert_eq(ge, re.numpy()); assert_eq(ga, ra.numpy())
    assert_eq(gl, rl.numpy()); assert_eq(gla, rla.numpy())

    re, ra = tu.remove_self_loops(t(coo), t(ATTR))
    ge, ga = pu.remove_self_loops(np.asarray(coo), ATTR)
    assert_eq(ge, re.numpy()); assert_eq(ga, ra.numpy())

    re, ra = tu.add_remaining_self_loops(t(coo), t(ATTR), fill_value=2.0,
                                         num_nodes=N)
    ge, ga = pu.add_remaining_self_loops(np.asarray(coo), ATTR,
                                         fill_value=2.0, num_nodes=N)
    # ours keeps zeroed placeholder rows for removed loops (static
    # shapes); compare the accumulated dense attribute instead
    def dense(e, a):
        d = np.zeros((N, N, 3))
        np.add.at(d, (np.asarray(e)[0], np.asarray(e)[1]), np.asarray(a))
        return d
    np.testing.assert_allclose(dense(ge, ga), dense(re.numpy(), ra.numpy()),
                               rtol=1e-5, atol=1e-6)


def test_sort_edge_index():
    # unique edges: the reference's index_sort fallback (torch.sort) is
    # NOT stable, so duplicate-edge tie order is arbitrary there
    uniq = np.unique(COO[0] * N + COO[1], return_index=True)[1]
    coo_u, attr_u = COO[:, uniq], ATTR[uniq]
    r, ra = tu.sort_edge_index(t(coo_u), t(attr_u))
    g, ga = pu.sort_edge_index(coo_u, attr_u)
    assert_eq(g, r.numpy()); assert_eq(ga, ra.numpy())


def test_remove_isolated_nodes():
    coo = COO.copy()
    coo[coo >= N - 3] = 0      # make the last nodes isolated
    re, _, rmask = tu.remove_isolated_nodes(t(coo), num_nodes=N)
    ge, gmask, _ = pu.remove_isolated_nodes(coo, num_nodes=N)
    assert_eq(gmask, rmask.numpy())
    assert_eq(ge, re.numpy())
    # a node with ONLY self-loops counts as isolated (loops dropped)
    lonely = np.array([[0, 5, 5], [1, 5, 5]])
    re2, _, rm2 = tu.remove_isolated_nodes(t(lonely), num_nodes=6)
    ge2, gm2, _ = pu.remove_isolated_nodes(lonely, num_nodes=6)
    assert_eq(gm2, rm2.numpy())
    assert_eq(ge2, re2.numpy())


def test_bipartite_subgraph():
    src_set = np.unique(rng.integers(0, N, 6))
    dst_set = np.unique(rng.integers(0, N, 6))
    re, ra = tu.bipartite_subgraph((t(src_set), t(dst_set)), t(COO),
                                   t(ATTR), size=(N, N))
    ge, ga, _ = pu.bipartite_subgraph((src_set, dst_set), COO, ATTR,
                                      size=(N, N))
    assert_eq(ge, re.numpy()); assert_eq(ga, ra.numpy())


def test_unbatch():
    batch = np.sort(rng.integers(0, 3, N))
    x = rng.standard_normal((N, 4)).astype(np.float32)
    r = tu.unbatch(t(x), t(batch))
    g = pu.unbatch(x, batch)
    assert len(r) == len(g)
    for a, b in zip(g, r):
        assert_eq(a, b.numpy())
    coo = np.sort(COO % 5, axis=0)  # edges within graph 0 (nodes 0-4)
    nb = np.sort(rng.integers(0, 3, N))
    r = tu.unbatch_edge_index(t(COO % 5), t(np.zeros(N, np.int64)))
    g = pu.unbatch_edge_index(COO % 5, np.zeros(N, np.int64))
    for a, b in zip(g, r):
        assert_eq(a, b.numpy())


def test_group_cat():
    xs = [rng.standard_normal((4, 2)).astype(np.float32)
          for _ in range(2)]
    idx = [np.sort(rng.integers(0, 6, 4)) for _ in range(2)]
    r, ri = tu.group_cat([t(v) for v in xs], [t(i) for i in idx],
                         dim=0, return_index=True)
    g, gi = pu.group_cat(xs, idx, dim=0, return_index=True)
    assert_eq(g, r.numpy()); assert_eq(gi, ri.numpy())


def test_grid():
    re, rpos = tu.grid(4, 5)
    ge, gpos = pu.grid(4, 5)
    assert_eq(np.sort(np.asarray(ge), 1), np.sort(re.numpy(), 1))
    assert_eq(gpos, rpos.numpy())


def test_get_mesh_laplacian():
    pos = rng.random((8, 3)).astype(np.float32)
    face = np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4], [4, 5, 6],
                     [5, 6, 7]]).T
    for norm in ('sym', 'rw', None):
        re, rw = tu.get_mesh_laplacian(t(pos), t(face), normalization=norm)
        ge, gw = pu.get_mesh_laplacian(pos, face, normalization=norm)
        # compare as dense matrices (edge ordering differs)
        rd = np.zeros((8, 8)); gd = np.zeros((8, 8))
        rd[re[0].numpy(), re[1].numpy()] = rw.numpy()
        gd[np.asarray(ge)[0], np.asarray(ge)[1]] = np.asarray(gw)
        np.testing.assert_allclose(gd, rd, rtol=1e-4, atol=1e-5)


def test_scipy_roundtrip():
    r = tu.to_scipy_sparse_matrix(t(COO), t(ATTR[:, 0]), num_nodes=N)
    g = pu.to_scipy_sparse_matrix(COO, ATTR[:, 0], num_nodes=N)
    np.testing.assert_allclose(g.toarray(), r.toarray(), rtol=1e-6)
    re, rw = tu.from_scipy_sparse_matrix(r)
    ge, gw = pu.from_scipy_sparse_matrix(g)
    assert_eq(ge, re.numpy()); assert_eq(gw, rw.numpy())


def test_structured_negative_sampling_feasible():
    dense = np.stack([np.repeat(np.arange(4), 4), np.tile(np.arange(4), 4)])
    assert (pu.structured_negative_sampling_feasible(dense, 4)
            == bool(tu.structured_negative_sampling_feasible(t(dense), 4)))
    assert (pu.structured_negative_sampling_feasible(COO, N)
            == bool(tu.structured_negative_sampling_feasible(t(COO), N)))


def test_networkx_roundtrip():
    from pytorch_geometric_tpu.data import Data
    from torch_geometric.data import Data as TData
    x = rng.standard_normal((N, 3)).astype(np.float32)
    rd = TData(x=t(x), edge_index=t(COO))
    gd = Data(x=x, edge_index=COO)
    rg = tu.to_networkx(rd)
    gg = pu.to_networkx(gd)
    assert set(rg.edges()) == set(gg.edges())
    back = pu.from_networkx(gg)
    rback = tu.from_networkx(rg)
    assert_eq(np.sort(np.asarray(back.edge_index).T, 0),
              np.sort(rback.edge_index.numpy().T, 0))
