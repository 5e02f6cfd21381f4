"""Norm layers + pooling tests."""
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.nn import norm as N
from pytorch_geometric_tpu.nn import pool as P

rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
BATCH = jnp.asarray(np.array([0, 0, 0, 1, 1, 1, 1, 1], np.int32))


def run(mod, *args, **kw):
    params = mod.init(jax.random.PRNGKey(0), *args, **kw)
    out = mod.apply(params, *args, **kw)
    return params, out


def test_instance_norm_zero_mean():
    _, out = run(N.InstanceNorm(), X, BATCH, 2)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:3].mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(out[3:].mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(out[:3].std(0), 1, atol=1e-2)


def test_layer_norm_graph_mode():
    _, out = run(N.LayerNorm(), X, BATCH, 2)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:3].mean(), 0, atol=1e-5)
    np.testing.assert_allclose(out[3:].mean(), 0, atol=1e-5)


def test_graph_norm_and_size_norm():
    _, out = run(N.GraphNorm(), X, BATCH, 2)
    assert out.shape == X.shape
    _, out = run(N.GraphSizeNorm(), X, BATCH, 2)
    np.testing.assert_allclose(np.asarray(out)[0],
                               np.asarray(X)[0] / np.sqrt(3), rtol=1e-5)


def test_pair_mean_msg_norms():
    _, out = run(N.PairNorm(), X, BATCH, 2)
    assert out.shape == X.shape
    _, out = run(N.MeanSubtractionNorm(), X, BATCH, 2)
    np.testing.assert_allclose(np.asarray(out)[:3].mean(0), 0, atol=1e-5)
    mod = N.MsgNorm(learn_scale=True)
    params = mod.init(jax.random.PRNGKey(0), X, X)
    out = mod.apply(params, X, X)
    assert out.shape == X.shape


def test_batch_norms():
    _, out = run(N.BatchNorm(4), X)
    assert out.shape == X.shape
    _, out = run(N.DiffGroupNorm(4, groups=2), X)
    assert out.shape == X.shape
    tv = jnp.asarray(np.array([0, 1, 0, 1, 0, 1, 0, 1], np.int32))
    _, out = run(N.HeteroBatchNorm(4, num_types=2), X, tv)
    assert out.shape == X.shape
    _, out = run(N.HeteroLayerNorm(4, num_types=2), X, tv)
    assert out.shape == X.shape


# -- pooling ----------------------------------------------------------------

def test_global_pools_with_padding():
    mask = jnp.asarray([True] * 6 + [False, False])
    batch = jnp.asarray(np.array([0, 0, 0, 1, 1, 1, 2, 2], np.int32))
    x = np.asarray(X)
    out = P.global_add_pool(X, batch, 3, mask=mask)
    np.testing.assert_allclose(out[1], x[3:6].sum(0), rtol=1e-5)
    np.testing.assert_allclose(out[2], 0, atol=1e-6)
    out = P.global_mean_pool(X, batch, 3, mask=mask)
    np.testing.assert_allclose(out[0], x[:3].mean(0), rtol=1e-5)
    out = P.global_max_pool(X, batch, 3, mask=mask)
    np.testing.assert_allclose(out[0], x[:3].max(0), rtol=1e-5)


def test_select_topk_per_graph():
    score = jnp.asarray(np.array([0.1, 0.9, 0.5, 0.3, 0.8, 0.2, 0.7, 0.4],
                                 np.float32))
    sel = P.select_topk(score, BATCH, 2, ratio=0.5, max_nodes_per_graph=5)
    # graph0 has 3 nodes -> k_g = 2; graph1 has 5 -> 3; slots = ceil(.5*5)=3
    assert sel.cluster_size == 3
    idx = np.asarray(sel.node_index).reshape(2, 3)
    m = np.asarray(sel.mask).reshape(2, 3)
    assert idx[0, 0] == 1 and idx[0, 1] == 2     # top scores graph 0
    assert m[0].sum() == 2 and m[1].sum() == 3
    assert idx[1, 0] == 4 and idx[1, 1] == 6


def test_topk_pooling_and_sag():
    coo = jnp.asarray(np.array([[0, 1, 2, 3, 4, 5, 6, 7],
                                [1, 2, 0, 4, 5, 6, 7, 3]], np.int32))
    mod = P.TopKPooling(in_channels=4, ratio=0.5)
    params = mod.init(jax.random.PRNGKey(0), X, coo, BATCH, 2,
                      max_nodes_per_graph=5)
    out = mod.apply(params, X, coo, BATCH, 2, max_nodes_per_graph=5)
    assert out.x.shape == (6, 4)
    assert out.edge_index.shape == (2, 8)
    # surviving edges connect kept slots only
    kept = np.asarray(out.edge_index)[:, np.asarray(out.edge_mask)]
    assert (kept < 6).all()
    mod = P.SAGPooling(in_channels=4, ratio=0.5)
    params = mod.init(jax.random.PRNGKey(0), X, coo, BATCH, 2,
                      max_nodes_per_graph=5)
    out = mod.apply(params, X, coo, BATCH, 2, max_nodes_per_graph=5)
    assert out.x.shape == (6, 4)


def test_knn_and_fps():
    pts = jnp.asarray(np.array([[0, 0], [0, 1], [0, 2], [10, 0], [10, 1],
                                [10, 2]], np.float32))
    batch = jnp.asarray(np.array([0, 0, 0, 1, 1, 1], np.int32))
    coo, valid = P.knn_graph(pts, k=2, batch=batch)
    coo, valid = np.asarray(coo), np.asarray(valid)
    # neighbors stay within batch
    for e in range(coo.shape[1]):
        if valid[e]:
            assert batch[coo[0, e]] == batch[coo[1, e]]
    sel = P.fps(pts, num_samples=2)
    sel = np.asarray(sel)
    assert sel[0] == 0 and sel[1] == 5  # farthest from point 0

    ei, v = P.radius(pts, pts, r=1.5, max_num_neighbors=3)
    ei, v = np.asarray(ei), np.asarray(v)
    d = np.linalg.norm(np.asarray(pts)[ei[1]] - np.asarray(pts)[ei[0]],
                       axis=-1)
    assert (d[v] <= 1.5 + 1e-6).all()


def test_voxel_grid():
    pts = jnp.asarray(np.array([[0.1, 0.1], [0.2, 0.2], [1.5, 1.5]],
                               np.float32))
    vid = np.asarray(P.voxel_grid(pts, size=1.0))
    assert vid[0] == vid[1] and vid[0] != vid[2]
