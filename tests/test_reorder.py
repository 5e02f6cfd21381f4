"""Node reordering: permutation correctness, SpMM equivalence, and
block-fill improvement on scale-free graphs."""
import jax.numpy as jnp
import numpy as np

import pytorch_geometric_tpu as pgt
import pytorch_geometric_tpu.transforms as T
from pytorch_geometric_tpu.ops import spmm
from pytorch_geometric_tpu.utils import (apply_node_permutation,
                                         block_fill_stats, cluster_order,
                                         degree_order,
                                         reverse_cuthill_mckee)


def _powerlaw(n=3000, e=30000, seed=0):
    rng = np.random.default_rng(seed)
    w = np.arange(1, n + 1) ** -0.9
    w /= w.sum()
    src, dst = rng.choice(n, e, p=w), rng.choice(n, e, p=w)
    sc = rng.permutation(n)
    return np.stack([sc[src], sc[dst]])


def test_orderings_are_permutations():
    coo = _powerlaw()
    n = 3000
    for fn in (degree_order, reverse_cuthill_mckee, cluster_order):
        perm = fn(coo, n)
        assert perm.shape == (n,)
        assert np.array_equal(np.sort(perm), np.arange(n))


def test_rcm_reduces_bandwidth_on_path_graph():
    # scrambled path graph: RCM must recover near-unit bandwidth
    n = 500
    rng = np.random.default_rng(0)
    sc = rng.permutation(n)
    path = np.stack([np.arange(n - 1), np.arange(1, n)])
    coo = np.stack([sc[path[0]], sc[path[1]]])
    perm = reverse_cuthill_mckee(coo, n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    c2 = inv[coo]
    bw = np.abs(c2[0] - c2[1]).max()
    assert bw <= 2, bw


def test_spmm_equivalence_after_reorder():
    coo = _powerlaw(n=400, e=3000)
    n = 400
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    ei = pgt.EdgeIndex(jnp.asarray(coo.astype(np.int32)), (n, n))
    ref = np.asarray(spmm(ei, jnp.asarray(x)))

    perm = degree_order(coo, n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ei2 = pgt.EdgeIndex(jnp.asarray(inv[coo].astype(np.int32)), (n, n))
    out2 = np.asarray(spmm(ei2, jnp.asarray(x[perm])))
    # out2 is in new order: out2[new] corresponds to ref[perm[new]]
    np.testing.assert_allclose(out2, ref[perm], rtol=1e-5, atol=1e-5)


def test_reorder_transform_improves_block_fill():
    coo = _powerlaw(n=20000, e=200000)
    n = 20000
    rng = np.random.default_rng(2)
    data = pgt.data.Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                         y=rng.integers(0, 3, n),
                         edge_index=coo.astype(np.int64), num_nodes=n)
    cap0, _, nb0 = block_fill_stats(coo, n)
    out = T.ReorderNodes()(data)
    c2 = np.asarray(out.edge_index)
    cap1, _, nb1 = block_fill_stats(c2, n)
    assert cap1 > cap0 * 1.5, (cap0, cap1)
    assert nb1 < nb0, (nb0, nb1)
    # node attributes moved with the permutation
    perm = np.asarray(out.node_perm)
    np.testing.assert_array_equal(np.asarray(out.y),
                                  np.asarray(data.y)[perm])
    np.testing.assert_allclose(np.asarray(out.x),
                               np.asarray(data.x)[perm])


def test_apply_node_permutation_roundtrip():
    coo = _powerlaw(n=200, e=900)
    n = 200
    rng = np.random.default_rng(3)
    data = pgt.data.Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                         edge_index=coo.astype(np.int64), num_nodes=n)
    perm = rng.permutation(n)
    out, inv = apply_node_permutation(data, perm)
    # applying inv as a permutation undoes it
    back, _ = apply_node_permutation(out, inv)
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(data.x))
    np.testing.assert_array_equal(np.asarray(back.edge_index), coo)


def test_apply_node_permutation_edge_attrs_untouched():
    """num_edges == num_nodes ring graph: edge_weight must NOT be
    permuted by the node permutation (regression)."""
    n = 64
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n])
    rng = np.random.default_rng(0)
    ew = rng.random(n).astype(np.float32)
    data = pgt.data.Data(x=rng.standard_normal((n, 3)).astype(np.float32),
                         edge_index=ring.astype(np.int64),
                         edge_weight=ew, num_nodes=n)
    perm = rng.permutation(n)
    out, _ = apply_node_permutation(data, perm)
    np.testing.assert_array_equal(np.asarray(out.edge_weight), ew)
    # padded sentinel endpoints survive
    pad = np.full((2, 5), n)
    data2 = data.replace(edge_index=np.concatenate([ring, pad], 1))
    out2, _ = apply_node_permutation(data2, perm)
    assert (np.asarray(out2.edge_index)[:, -5:] == n).all()
