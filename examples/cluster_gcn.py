"""Cluster-GCN training: partition once, train on stitched cluster
batches (reference ``examples/cluster_gcn_reddit.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.loader import ClusterData, ClusterLoader
from pytorch_geometric_tpu.nn.models import GCN


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=2000, avg_degree=10,
                                    num_channels=64, num_classes=10)[0]
    cd = ClusterData(data, num_parts=32)
    loader = ClusterLoader(cd, batch_size=4, shuffle=True, seed=0)

    model = GCN(hidden_channels=64, num_layers=2, out_channels=10)
    sub0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(np.asarray(sub0.x)),
                        jnp.asarray(np.asarray(sub0.edge_index)))
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, ei, y):
        def loss_fn(p):
            logits = model.apply(p, x, ei)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(5):
        tot, nb = 0.0, 0
        for sub in loader:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(np.asarray(sub.x)),
                jnp.asarray(np.asarray(sub.edge_index).astype(np.int32)),
                jnp.asarray(np.asarray(sub.y).astype(np.int32)))
            tot, nb = tot + float(loss), nb + 1
        print(f'epoch {epoch}: mean cluster-batch loss {tot / nb:.4f}')


if __name__ == '__main__':
    main()
