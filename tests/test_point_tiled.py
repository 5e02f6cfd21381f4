"""Tiled (large-N) point-cloud kernels match the dense path.

Reference boundary: torch_cluster knn/knn_graph/nearest wrapped at
``/root/reference/torch_geometric/nn/pool/__init__.py:63-297``.
"""
import importlib

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_geometric_tpu.nn.pool.point as P


@pytest.fixture(autouse=True)
def _restore():
    yield
    importlib.reload(P)


def _force_tiled(qt=64, xt=128):
    P._DENSE_LIMIT = 0
    P._QT, P._XT = qt, xt


def _edge_d2(pos_x, pos_y, ei, valid):
    xs = pos_x[jnp.minimum(ei[1], pos_x.shape[0] - 1)]
    ys = pos_y[jnp.minimum(ei[0], pos_y.shape[0] - 1)]
    return jnp.where(valid, ((xs - ys) ** 2).sum(-1), -1.0)


def test_tiled_knn_matches_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((500, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((300, 3)).astype(np.float32))
    bx = jnp.asarray(rng.integers(0, 3, 500))
    by = jnp.asarray(rng.integers(0, 3, 300))
    mx = jnp.asarray(rng.random(500) > 0.1)
    my = jnp.asarray(rng.random(300) > 0.1)
    ei_d, v_d = P.knn(x, y, 5, bx, by, mx, my)
    _force_tiled()
    ei_t, v_t = P.knn(x, y, 5, bx, by, mx, my)
    assert bool((v_d == v_t).all())
    np.testing.assert_allclose(_edge_d2(x, y, ei_d, v_d),
                               _edge_d2(x, y, ei_t, v_t), atol=1e-5)


def test_tiled_knn_graph_excludes_self():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((300, 3)).astype(np.float32))
    b = jnp.asarray(rng.integers(0, 2, 300))
    g_d, gv_d = P.knn_graph(x, 4, batch=b)
    _force_tiled()
    g_t, gv_t = P.knn_graph(x, 4, batch=b)
    assert not bool(jnp.where(gv_t, g_t[0] == g_t[1], False).any())
    assert bool((gv_d == gv_t).all())
    np.testing.assert_allclose(_edge_d2(x, x, g_d, gv_d),
                               _edge_d2(x, x, g_t, gv_t), atol=1e-5)


def test_tiled_nearest_matches_dense():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((400, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((150, 3)).astype(np.float32))
    near_d = P.nearest(x, y)
    _force_tiled()
    near_t = P.nearest(x, y)
    d_d = ((x - y[near_d]) ** 2).sum(-1)
    d_t = ((x - y[near_t]) ** 2).sum(-1)
    np.testing.assert_allclose(d_d, d_t, atol=1e-5)


def test_tiled_radius_matches_dense():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((300, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((200, 3)).astype(np.float32))
    ei_d, v_d = P.radius(x, y, 0.5, max_num_neighbors=8)
    _force_tiled()
    ei_t, v_t = P.radius(x, y, 0.5, max_num_neighbors=8)
    assert int(v_d.sum()) == int(v_t.sum())
    np.testing.assert_allclose(
        np.sort(np.asarray(_edge_d2(x, y, ei_d, v_d))),
        np.sort(np.asarray(_edge_d2(x, y, ei_t, v_t))), atol=1e-5)
