import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.nn import (GCNConv, SAGEConv, GINConv, GINEConv,
                                      GATConv, GATv2Conv, gcn_norm)
from pytorch_geometric_tpu.nn.models import MLP
from conftest import make_random_graph

KEY = jax.random.key(0)


def _init_apply(conv, *args, **kwargs):
    params = conv.init(KEY, *args, **kwargs)
    return conv.apply(params, *args, **kwargs), params


def test_gcn_conv_shapes():
    x, ei, _ = make_random_graph(30, 100, 8)
    conv = GCNConv(out_channels=16)
    out, _ = _init_apply(conv, jnp.asarray(x), jnp.asarray(ei))
    assert out.shape == (30, 16)


def test_gcn_norm_values():
    # path graph 0->1->2: check D^-1/2 (A+I) D^-1/2 weights by hand
    ei = jnp.asarray([[0, 1], [1, 2]])
    coo, w = gcn_norm(ei, num_nodes=3)
    # after adding self loops: edges (0,1),(1,2),(0,0),(1,1),(2,2)
    # deg(dst): node0=1, node1=2, node2=2
    np.testing.assert_allclose(
        np.asarray(w),
        [1 / np.sqrt(1 * 2), 1 / np.sqrt(2 * 2), 1 / 1, 1 / 2, 1 / 2],
        rtol=1e-5)


def test_gcn_conv_padded_edges_noop():
    x, ei, _ = make_random_graph(30, 100, 8)
    conv = GCNConv(out_channels=16)
    params = conv.init(KEY, jnp.asarray(x), jnp.asarray(ei))
    out_ref = conv.apply(params, jnp.asarray(x), jnp.asarray(ei))
    # append padded edges pointing at row N
    pad = np.full((2, 20), 30, np.int32)
    ei_pad = np.concatenate([ei, pad], axis=1)
    out_pad = conv.apply(params, jnp.asarray(x), jnp.asarray(ei_pad))
    np.testing.assert_allclose(out_ref, out_pad, rtol=1e-4, atol=1e-5)


def test_sage_conv():
    x, ei, _ = make_random_graph(30, 100, 8)
    conv = SAGEConv(out_channels=16)
    out, _ = _init_apply(conv, jnp.asarray(x), jnp.asarray(ei))
    assert out.shape == (30, 16)


def test_sage_conv_bipartite():
    rng = np.random.default_rng(0)
    x_src = jnp.asarray(rng.standard_normal((20, 8)).astype(np.float32))
    x_dst = jnp.asarray(rng.standard_normal((10, 8)).astype(np.float32))
    ei = jnp.asarray(np.stack([rng.integers(0, 20, 50),
                               rng.integers(0, 10, 50)]).astype(np.int32))
    conv = SAGEConv(out_channels=16)
    out, _ = _init_apply(conv, (x_src, x_dst), ei)
    assert out.shape == (10, 16)


def test_gin_conv():
    x, ei, _ = make_random_graph(30, 100, 8)
    conv = GINConv(mlp=MLP(channel_list=[16, 16]), train_eps=True)
    out, _ = _init_apply(conv, jnp.asarray(x), jnp.asarray(ei))
    assert out.shape == (30, 16)


def test_gine_conv():
    x, ei, _ = make_random_graph(30, 100, 8)
    ea = jnp.asarray(np.random.default_rng(0).standard_normal(
        (100, 4)).astype(np.float32))
    conv = GINEConv(mlp=MLP(channel_list=[16, 16]))
    out, _ = _init_apply(conv, jnp.asarray(x), jnp.asarray(ei), ea)
    assert out.shape == (30, 16)


@pytest.mark.parametrize('cls', [GATConv, GATv2Conv])
def test_gat_conv(cls):
    x, ei, _ = make_random_graph(30, 100, 8)
    conv = cls(out_channels=8, heads=4)
    out, _ = _init_apply(conv, jnp.asarray(x), jnp.asarray(ei))
    assert out.shape == (30, 32)  # concat heads


@pytest.mark.parametrize('cls', [GATConv, GATv2Conv])
def test_gat_attention_weights_normalized(cls):
    x, ei, _ = make_random_graph(20, 60, 8)
    conv = cls(out_channels=8, heads=2)
    params = conv.init(KEY, jnp.asarray(x), jnp.asarray(ei))
    out, (coo, alpha) = conv.apply(params, jnp.asarray(x), jnp.asarray(ei),
                                   return_attention_weights=True)
    alpha = np.asarray(alpha)
    dst = np.asarray(coo[1])
    sums = np.zeros((20, alpha.shape[1]))
    np.add.at(sums, dst, alpha)
    # nodes with >=1 incoming edge must have attention summing to 1
    has_in = np.zeros(20, bool)
    has_in[dst] = True
    np.testing.assert_allclose(sums[has_in], 1.0, rtol=1e-4)


def test_conv_jit_grad():
    x, ei, y = make_random_graph(30, 100, 8, num_classes=4)
    conv = GCNConv(out_channels=4)
    xj, eij, yj = jnp.asarray(x), jnp.asarray(ei), jnp.asarray(y)
    params = conv.init(KEY, xj, eij)

    @jax.jit
    def loss_fn(p):
        logits = conv.apply(p, xj, eij)
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(30), yj])

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in flat)
    assert any(jnp.any(l != 0) for l in flat)
