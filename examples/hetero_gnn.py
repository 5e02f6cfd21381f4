"""Heterogeneous node classification with HGT + HeteroNeighborLoader
(reference ``examples/hetero/hgt_dblp.py`` flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.datasets import FakeHeteroDataset
from pytorch_geometric_tpu.nn import HGTConv


def main():
    data = FakeHeteroDataset(num_graphs=1, avg_num_nodes=150,
                             num_classes=4, seed=0)[0]
    target = data.node_types[0]
    meta = (tuple(data.metadata()[0]), tuple(data.metadata()[1]))
    model = HGTConv(out_channels=4, metadata=meta, heads=2)
    xd = {t: jnp.asarray(np.asarray(data[t].x))
          for t in data.node_types}
    ed = {et: jnp.asarray(np.asarray(data[et].edge_index))
          for et in data.edge_types}
    y = jnp.asarray(np.asarray(data[target].y))
    params = model.init(jax.random.PRNGKey(0), xd, ed)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, xd, ed)[target]
            return optax.softmax_cross_entropy_with_integer_labels(
                out, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    for epoch in range(100):
        params, opt, loss = step(params, opt)
    out = model.apply(params, xd, ed)[target]
    acc = float((out.argmax(-1) == y).mean())
    print(f'loss {float(loss):.4f}, acc {acc:.4f}')


if __name__ == '__main__':
    main()
