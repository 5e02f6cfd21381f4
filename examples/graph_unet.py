"""Node classification with Graph U-Net (TopK pool/unpool encoder-
decoder) (reference ``examples/graph_unet.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn.models import GraphUNet


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=600, avg_degree=8,
                                    num_channels=32, num_classes=5)[0]
    n = data.num_nodes
    x = jnp.asarray(np.asarray(data.x))
    y = jnp.asarray(np.asarray(data.y).astype(np.int32))
    ei = jnp.asarray(np.asarray(data.edge_index).astype(np.int32))
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray(rng.random(n) < 0.6)

    model = GraphUNet(hidden_channels=32, out_channels=5, depth=3)
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

    for epoch in range(80):
        params, opt_state, loss = step(params, opt_state)
    logits = model.apply(params, x, ei)
    acc = float((jnp.argmax(logits, -1) == y)[~train_mask].mean())
    print(f'loss {float(loss):.4f}, held-out acc {acc:.4f}')


if __name__ == '__main__':
    main()
