"""Deep reversible GNN (GroupAddRev): activation memory independent of
depth (reference ``examples/rev_gnn.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as fnn

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn import GraphConv
from pytorch_geometric_tpu.nn.models import GroupAddRev

DEPTH, H, C = 4, 64, 8


class RevGNN(fnn.Module):
    @fnn.compact
    def __call__(self, x, ei):
        h = fnn.Dense(H)(x)
        for _ in range(DEPTH):
            h = GroupAddRev(conv=GraphConv(out_channels=H // 2),
                            num_groups=2)(h, ei)
            h = fnn.relu(h)
        return fnn.Dense(C)(h)


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=800, avg_degree=10,
                                    num_channels=32, num_classes=C)[0]
    n = data.num_nodes
    x = jnp.asarray(np.asarray(data.x))
    y = jnp.asarray(np.asarray(data.y).astype(np.int32))
    ei = jnp.asarray(np.asarray(data.edge_index).astype(np.int32))
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray(rng.random(n) < 0.6)

    model = RevGNN()
    params = model.init(jax.random.PRNGKey(0), x, ei)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            l = optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, x, ei), y)
            return jnp.where(train_mask, l, 0).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(60):
        params, opt_state, loss = step(params, opt_state)
    logits = model.apply(params, x, ei)
    acc = float((jnp.argmax(logits, -1) == y)[~train_mask].mean())
    print(f'loss {float(loss):.4f}, held-out acc {acc:.4f}')


if __name__ == '__main__':
    main()
