"""Production mini-batch pipeline: structure-only sampling on worker
threads + device-resident features gathered inside the jitted step.

The host feature join dominates batch time at wide feature dims
(measured 3x on the 500k-node config) — the TPU-right layout keeps
``X``/``Y`` on the device once and gathers rows by ``batch.n_id``
under jit. Compare with ``neighbor_sampling.py`` (host-joined
variant, the reference's default flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.loader import NeighborLoader, PrefetchLoader
from pytorch_geometric_tpu.nn.models import GraphSAGE


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=2000, avg_degree=12,
                                    num_channels=32, num_classes=7)[0]
    # device-resident feature/label tables (uploaded once)
    X = jnp.asarray(np.asarray(data.x))
    Y = jnp.asarray(np.asarray(data.y).astype(np.int32))

    loader = NeighborLoader(data, num_neighbors=[15, 10], batch_size=64,
                            shuffle=True, num_workers=2,
                            filter_features=False)
    model = GraphSAGE(hidden_channels=64, num_layers=2, out_channels=7)
    b0 = next(iter(loader))
    n_cap = b0.num_nodes
    params = model.init(jax.random.PRNGKey(0), X[:n_cap],
                        np.asarray(b0.edge_index))
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, n_id, node_mask, coo, emask, bs):
        # HBM-speed gathers replace the host join
        safe = jnp.where(node_mask, n_id, 0)
        x = jnp.where(node_mask[:, None], X[safe], 0)
        y = Y[safe]

        def loss_fn(p):
            logits = model.apply(p, x, coo, edge_mask=emask)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            seed = jnp.arange(l.shape[0]) < bs   # seeds come first
            return jnp.where(seed, l, 0).sum() / bs
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    for epoch in range(3):
        # prefetch thread overlaps sampling with the device step; batch
        # fields are already device arrays — pass them straight through
        # (np.asarray / int() on them would cost a D2H round trip each)
        for b in PrefetchLoader(loader, num_threads=1):
            coo = (b.edge_index.coo if hasattr(b.edge_index, 'coo')
                   else b.edge_index)
            params, opt, loss = step(
                params, opt, b.n_id, b.node_mask, coo,
                b.edge_mask, b.batch_size)
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
