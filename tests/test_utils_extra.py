"""utils/extra + convert tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_geometric_tpu.utils as U
from pytorch_geometric_tpu.data import Data

rng = np.random.default_rng(0)
COO = np.stack([rng.integers(0, 10, 40),
                rng.integers(0, 10, 40)]).astype(np.int32)


def test_get_laplacian():
    coo, w = U.get_laplacian(jnp.asarray(COO), num_nodes=10)
    # L row sums vanish over the SOURCE endpoint (reference
    # get_laplacian computes degrees over row)
    n = 10
    sums = np.zeros(n)
    np.add.at(sums, np.asarray(coo)[0], np.asarray(w))
    np.testing.assert_allclose(sums, 0, atol=1e-5)
    coo, w = U.get_laplacian(jnp.asarray(COO), normalization='sym',
                             num_nodes=10)
    assert len(np.asarray(w)) == 40 + 10


def test_homophily_and_assortativity():
    y = np.zeros(10, np.int64)
    h = U.homophily(COO, y)
    assert h == 1.0
    y = np.arange(10)
    assert U.homophily(COO, y) < 0.2
    a = U.assortativity(COO)
    assert -1.0 <= a <= 1.0


def test_map_index():
    src = np.array([5, 3, 5, 9])
    index = np.array([9, 5, 3])
    out, _ = U.map_index(src, index, inclusive=True)
    np.testing.assert_array_equal(out, [1, 2, 1, 0])
    out, mask = U.map_index(np.array([5, 7]), index)
    np.testing.assert_array_equal(out, [1])
    np.testing.assert_array_equal(mask, [True, False])
    with pytest.raises(ValueError):
        U.map_index(np.array([7]), index, inclusive=True)


def test_ppr():
    coo, vals = U.ppr(COO, 10, alpha=0.2)
    assert (vals > 0).all()
    # rows sum to ~1 before thresholding; after, still close
    import numpy as np
    dense = np.zeros((10, 10))
    dense[coo[0], coo[1]] = vals
    assert (dense.sum(1) > 0.5).all()


def test_trim_to_layer():
    x = jnp.ones((10, 3))
    coo = jnp.asarray(COO[:, :20])
    nm, em = U.trim_to_layer(1, [4, 3, 3], [10, 10], x, coo)
    assert int(nm.sum()) == 7
    assert int(em.sum()) == 10


def test_normalized_cut_unbatch():
    w = jnp.ones((COO.shape[1],))
    out = U.normalized_cut(jnp.asarray(COO), w, 10)
    assert out.shape == (40,)
    batch = np.array([0, 0, 0, 1, 1, 2])
    parts = U.unbatch(np.arange(6), batch)
    assert [len(p) for p in parts] == [3, 2, 1]
    coo2 = np.array([[0, 1, 3, 5], [1, 2, 4, 5]])
    eidx = U.unbatch_edge_index(coo2, batch)
    np.testing.assert_array_equal(eidx[1], [[0], [1]])


def test_shuffle_and_mask():
    x = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    out, perm = U.shuffle_node(x, jax.random.PRNGKey(0))
    assert sorted(np.asarray(perm).tolist()) == list(range(8))
    out, mask = U.mask_feature(x, jax.random.PRNGKey(0), p=0.5)
    assert mask.shape == (1, 4)


def test_networkx_scipy_roundtrip():
    data = Data(x=rng.standard_normal((10, 3)).astype(np.float32),
                edge_index=COO, num_nodes=10)
    g = U.to_networkx(data)
    assert g.number_of_nodes() == 10
    back = U.from_networkx(g)
    assert back.num_nodes == 10
    m = U.to_scipy_sparse_matrix(COO, num_nodes=10)
    coo2, w = U.from_scipy_sparse_matrix(m)
    assert coo2.shape[1] <= COO.shape[1]  # scipy sums duplicates
