"""GraphSAINT random-walk subgraph training with normalisation
statistics (reference ``examples/graph_saint.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.loader import GraphSAINTRandomWalkSampler
from pytorch_geometric_tpu.nn.models import GraphSAGE


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=1500, avg_degree=10,
                                    num_channels=32, num_classes=6)[0]
    sampler = GraphSAINTRandomWalkSampler(
        data, batch_size=200, walk_length=2, num_steps=8,
        sample_coverage=2, seed=0)

    model = GraphSAGE(hidden_channels=64, num_layers=2, out_channels=6)
    b0 = next(iter(sampler))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(np.asarray(b0.x)),
                        jnp.asarray(np.asarray(b0.edge_index)))
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, ei, y, node_norm):
        def loss_fn(p):
            logits = model.apply(p, x, ei)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            # SAINT bias correction: weight per-node loss by node_norm
            return (l * node_norm).sum() / node_norm.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(3):
        for sub in sampler:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(np.asarray(sub.x)),
                jnp.asarray(np.asarray(sub.edge_index).astype(np.int32)),
                jnp.asarray(np.asarray(sub.y).astype(np.int32)),
                jnp.asarray(np.asarray(sub.node_norm).astype(np.float32)))
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
