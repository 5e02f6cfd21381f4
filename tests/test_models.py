import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_geometric_tpu.datasets import FakeDataset, planetoid_like
from pytorch_geometric_tpu.nn.models import GCN, GraphSAGE, GIN, GAT, MLP

KEY = jax.random.key(0)


@pytest.mark.parametrize('cls', [GCN, GraphSAGE, GIN, GAT])
def test_basic_gnn_shapes(cls):
    data = FakeDataset(1, avg_num_nodes=40, avg_degree=4, num_channels=8,
                       num_classes=3)[0]
    model = cls(hidden_channels=16, num_layers=2, out_channels=3)
    x, ei = jnp.asarray(data.x), jnp.asarray(data.edge_index)
    params = model.init(KEY, x, ei)
    out = model.apply(params, x, ei)
    assert out.shape == (data.num_nodes, 3)


def test_basic_gnn_jk_cat():
    data = FakeDataset(1, avg_num_nodes=40, avg_degree=4, num_channels=8,
                       num_classes=3)[0]
    model = GCN(hidden_channels=16, num_layers=3, out_channels=3, jk='cat')
    x, ei = jnp.asarray(data.x), jnp.asarray(data.edge_index)
    params = model.init(KEY, x, ei)
    out = model.apply(params, x, ei)
    assert out.shape == (data.num_nodes, 3)


def test_gcn_trains_on_cora_like():
    """End-to-end slice: 2-layer GCN, full batch, optax Adam — the
    BASELINE config-1 shape (Cora quick-tour) on a synthetic citation
    graph. Asserts training accuracy and generalisation."""
    data = planetoid_like(num_nodes=300, num_edges=1500, num_features=32,
                          num_classes=4, train_per_class=20, num_val=50,
                          num_test=100)
    x = jnp.asarray(data.x)
    ei = jnp.asarray(data.edge_index)
    y = jnp.asarray(data.y)
    train_mask = jnp.asarray(data.train_mask)
    test_mask = jnp.asarray(data.test_mask)

    model = GCN(hidden_channels=16, num_layers=2, out_channels=4)
    params = model.init(KEY, x, ei)
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, ei)
            ll = jax.nn.log_softmax(logits)
            nll = -ll[jnp.arange(x.shape[0]), y]
            return jnp.sum(jnp.where(train_mask, nll, 0)) / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, f'loss did not drop: {losses[::10]}'

    logits = model.apply(params, x, ei)
    pred = jnp.argmax(logits, axis=-1)
    test_acc = float(jnp.sum(jnp.where(test_mask, pred == y, 0))
                     / test_mask.sum())
    assert test_acc > 0.6, f'test accuracy too low: {test_acc}'
