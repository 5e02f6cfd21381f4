"""EdgeIndex container API tests (reference test/test_edge_index.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu import EdgeIndex

rng = np.random.default_rng(0)
N, E = 12, 40
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int32)


def test_basic_accessors():
    ei = EdgeIndex(jnp.asarray(COO), (N, N))
    assert ei.num_edges == E
    assert ei.num_src_nodes == N and ei.num_dst_nodes == N
    np.testing.assert_array_equal(np.asarray(ei.row), COO[0])
    np.testing.assert_array_equal(np.asarray(ei[1]), COO[1])


def test_csr_csc_orientations():
    ei = EdgeIndex(jnp.asarray(COO), (N, N)).fill_cache()
    csr = ei.csr
    # CSR sorted by row; indptr counts out-degrees
    deg = np.bincount(COO[0], minlength=N)
    np.testing.assert_array_equal(np.diff(np.asarray(csr.indptr)), deg)
    # perm reconstructs the sorted orientation
    perm = np.asarray(csr.perm)
    np.testing.assert_array_equal(np.asarray(csr.indices), COO[1][perm])
    assert (np.diff(COO[0][perm]) >= 0).all()

    csc = ei.csc
    deg_in = np.bincount(COO[1], minlength=N)
    np.testing.assert_array_equal(np.diff(np.asarray(csc.indptr)),
                                  deg_in)


def test_sort_by_and_flip():
    ei = EdgeIndex(jnp.asarray(COO), (N, N))
    sorted_ei, perm = ei.sort_by('row')
    assert (np.diff(np.asarray(sorted_ei.row)) >= 0).all()
    np.testing.assert_array_equal(np.asarray(sorted_ei.coo),
                                  COO[:, np.asarray(perm)])
    flipped = ei.flip()
    np.testing.assert_array_equal(np.asarray(flipped.row), COO[1])
    # flip of cached swaps orientations and blocked layouts
    cached = ei.fill_cache()
    f = cached.flip()
    assert f.csr is cached.csc and f.csc is cached.csr
    assert f.blocked is cached.blocked_t


def test_to_dense_adj_and_matmul():
    w = rng.random(E).astype(np.float32)
    x = rng.standard_normal((N, 6)).astype(np.float32)
    ei = EdgeIndex(jnp.asarray(COO), (N, N)).fill_cache()
    adj = np.asarray(ei.to_dense_adj(jnp.asarray(w)))
    ref = np.zeros((N, N), np.float32)
    np.add.at(ref, (COO[0], COO[1]), w)
    np.testing.assert_allclose(adj, ref, rtol=1e-6)
    out = ei.matmul(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), ref.T @ x, rtol=1e-4,
                               atol=1e-4)
    # transpose spmm == A x
    out_t = ei.matmul(jnp.asarray(x), jnp.asarray(w), transpose=True)
    np.testing.assert_allclose(np.asarray(out_t), ref @ x, rtol=1e-4,
                               atol=1e-4)


def test_pytree_roundtrip_with_caches():
    ei = EdgeIndex(jnp.asarray(COO), (N, N)).fill_cache()
    leaves, treedef = jax.tree_util.tree_flatten(ei)
    ei2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert ei2.sparse_size == (N, N)
    assert ei2.blocked is not None
    np.testing.assert_array_equal(np.asarray(ei2.coo), COO)

    @jax.jit
    def f(e, x):
        return e.matmul(x)

    x = jnp.ones((N, 3))
    out = f(ei, x)
    assert out.shape == (N, 3)


def test_padded_edges_dropped():
    coo_pad = np.concatenate([COO, np.full((2, 5), N, np.int32)], 1)
    ei = EdgeIndex(jnp.asarray(coo_pad), (N, N), num_real_edges=E)
    assert ei.num_real_edges == E
    out = ei.matmul(jnp.ones((N, 2)))
    ref = EdgeIndex(jnp.asarray(COO), (N, N)).matmul(jnp.ones((N, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6)
