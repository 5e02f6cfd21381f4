"""Mini-batch GraphSAGE with NeighborLoader (reference
``examples/reddit.py`` flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.loader import NeighborLoader
from pytorch_geometric_tpu.nn.models import GraphSAGE


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=2000, avg_degree=12,
                                    num_channels=32, num_classes=7)[0]
    loader = NeighborLoader(data, num_neighbors=[15, 10], batch_size=64,
                            shuffle=True)
    model = GraphSAGE(hidden_channels=64, num_layers=2, out_channels=7)
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x,
                        np.asarray(b0.edge_index))
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, coo, emask, y, seed_mask):
        def loss_fn(p):
            logits = model.apply(p, x, coo, edge_mask=emask)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.where(seed_mask, l, 0).sum() / seed_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    for epoch in range(3):
        for b in loader:
            seed_mask = jnp.arange(b.x.shape[0]) < int(b.batch_size)
            params, opt, loss = step(
                params, opt, jnp.asarray(b.x),
                jnp.asarray(np.asarray(b.edge_index)),
                jnp.asarray(b.edge_mask), jnp.asarray(b.y), seed_mask)
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
