"""Graph classification with GIN + bucketed DataLoader
(reference ``examples/mutag_gin.py`` flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.datasets import FakeDataset
from pytorch_geometric_tpu.loader import DataLoader
from pytorch_geometric_tpu.nn.models import GIN
from pytorch_geometric_tpu.nn.pool import global_add_pool


def main():
    ds = FakeDataset(num_graphs=64, avg_num_nodes=25, avg_degree=4,
                     num_channels=16, num_classes=2, task='graph',
                     seed=0)
    loader = DataLoader(ds, batch_size=16, shuffle=True)
    model = GIN(hidden_channels=32, num_layers=3)
    import flax.linen as fnn
    head = fnn.Dense(2)

    b0 = next(iter(loader))
    B = b0.num_graphs
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.edge_index.coo)
    hp = head.init(jax.random.PRNGKey(1), jnp.ones((B, 32)))
    tx = optax.adam(3e-3)
    ap = {'gnn': params, 'head': hp}
    opt = tx.init(ap)

    @jax.jit
    def step(ap, opt, x, coo, batch, nmask, y, num_graphs_mask):
        def loss_fn(ap):
            h = model.apply(ap['gnn'], x, coo)
            hg = global_add_pool(h, batch, B + 1, mask=nmask)[:B]
            logits = head.apply(ap['head'], hg)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.where(num_graphs_mask, l, 0).sum() \
                / num_graphs_mask.sum()
        loss, g = jax.value_and_grad(loss_fn)(ap)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(ap, up), opt, loss

    for epoch in range(10):
        for b in loader:
            y = jnp.asarray(np.concatenate(
                [np.asarray(g.y) for g in [b]])).reshape(-1)[:B]
            y = jnp.asarray(np.asarray(b.y).reshape(-1)[:B])
            gm = jnp.arange(B) < b.num_graphs
            ap, opt, loss = step(ap, opt, b.x, b.edge_index.coo,
                                 b.batch, b.node_mask, y, gm)
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
