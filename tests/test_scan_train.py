"""Scan-K sampled training parity (VERDICT r3 #7): K steps in one
dispatch (lax.scan over stacked batches) must match K per-batch
dispatches exactly, and the stacking contract must hold."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.loader import NeighborLoader
from pytorch_geometric_tpu.loader.scan_train import (
    make_device_train_step, stack_batches)
from pytorch_geometric_tpu.nn.models import GraphSAGE


def _pipeline(K=4):
    data = pgt.datasets.FakeDataset(avg_num_nodes=300, avg_degree=8,
                                    num_channels=12, num_classes=5)[0]
    X = jnp.asarray(np.asarray(data.x))
    Y = jnp.asarray(np.asarray(data.y).astype(np.int32))
    loader = NeighborLoader(data, num_neighbors=[5, 3], batch_size=16,
                            shuffle=False, filter_features=False)
    batches = []
    it = iter(loader)
    while len(batches) < K:
        try:
            batches.append(next(it))
        except StopIteration:
            it = iter(loader)
    model = GraphSAGE(hidden_channels=16, num_layers=2, out_channels=5)
    n_cap = int(batches[0].num_nodes)
    params = model.init(jax.random.PRNGKey(0), X[:n_cap],
                        np.asarray(batches[0].edge_index))
    tx = optax.adam(1e-2)
    return model, tx, params, X, Y, batches


def test_scan_matches_per_batch_dispatch():
    model, tx, params, X, Y, batches = _pipeline()
    step_fn, scan_fn = make_device_train_step(model, tx)
    stacked = stack_batches(batches)

    # arm A: K per-batch dispatches
    pa, oa = params, tx.init(params)
    for i in range(len(batches)):
        b = jax.tree_util.tree_map(lambda v: v[i], stacked)
        pa, oa, loss_a = step_fn(pa, oa, X, Y, b)

    # arm B: one scan dispatch
    pb, ob, loss_b = scan_fn(params, tx.init(params), X, Y, stacked)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-6)


def test_stacked_shapes_are_static():
    """The padding-bucket contract: NeighborLoader's fixed caps give
    every batch identical padded shapes, so the stack is rectangular
    and scan compiles once."""
    model, tx, params, X, Y, batches = _pipeline(K=6)
    shapes = {tuple(np.asarray(b.n_id).shape) for b in batches}
    assert len(shapes) == 1
    stacked = stack_batches(batches)
    assert stacked['n_id'].shape[0] == 6
    assert stacked['edge_index'].shape[0] == 6


def test_training_progresses_under_scan():
    model, tx, params, X, Y, batches = _pipeline(K=4)
    _, scan_fn = make_device_train_step(model, tx)
    stacked = stack_batches(batches)
    opt = tx.init(params)
    p, o, loss0 = scan_fn(params, opt, X, Y, stacked)
    for _ in range(5):
        p, o, loss = scan_fn(p, o, X, Y, stacked)
    assert float(loss) < float(loss0)
