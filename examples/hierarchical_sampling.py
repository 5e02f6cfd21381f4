"""Hierarchical neighborhood sampling: trim the padded batch per layer
so layer k only computes rows still needed k hops out
(reference ``examples/hierarchical_sampling.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.loader import NeighborLoader
from pytorch_geometric_tpu.nn import SAGEConv
from pytorch_geometric_tpu.utils import trim_to_layer

import flax.linen as fnn

H, C = 64, 6


class HierSAGE(fnn.Module):
    @fnn.compact
    def __call__(self, x, ei, num_sampled_nodes, num_sampled_edges):
        convs = [SAGEConv(out_channels=H), SAGEConv(out_channels=C)]
        h = x
        for i, conv in enumerate(convs):
            node_mask, edge_mask = trim_to_layer(
                i, num_sampled_nodes, num_sampled_edges, h, ei)
            # zero out trimmed rows/edges instead of slicing: shapes
            # stay static for XLA, masked rows cost no gradient
            h = conv(jnp.where(node_mask[:, None], h, 0),
                     jnp.where(edge_mask[None, :], ei, h.shape[0]))
            if i < len(convs) - 1:
                h = fnn.relu(h)
        return h


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=2000, avg_degree=12,
                                    num_channels=32, num_classes=C)[0]
    loader = NeighborLoader(data, num_neighbors=[10, 5], batch_size=128,
                            shuffle=True, seed=0)
    model = HierSAGE()
    b0 = next(iter(loader))
    args0 = (jnp.asarray(np.asarray(b0.x)),
             jnp.asarray(np.asarray(b0.edge_index).astype(np.int32)),
             list(b0.num_sampled_nodes), list(b0.num_sampled_edges))
    params = model.init(jax.random.PRNGKey(0), *args0)
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, ei, y, bs, nsn, nse):
        def loss_fn(p):
            logits = model.apply(p, x, ei, nsn, nse)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            seed = jnp.arange(l.shape[0]) < bs  # seed nodes come first
            return jnp.where(seed, l, 0).sum() / bs
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(2):
        for batch in loader:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(np.asarray(batch.x)),
                jnp.asarray(np.asarray(batch.edge_index).astype(np.int32)),
                jnp.asarray(np.asarray(batch.y).astype(np.int32)),
                int(batch.batch_size), list(batch.num_sampled_nodes),
                list(batch.num_sampled_edges))
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
