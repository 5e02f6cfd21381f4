"""Graph classification with memory-based pooling (MemPooling)
(reference ``examples/mem_pool.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as fnn

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.data import Batch
from pytorch_geometric_tpu.nn import GraphConv, MemPooling

H, C = 32, 2


class MemNet(fnn.Module):
    @fnn.compact
    def __call__(self, x, ei, batch, num_graphs):
        h = fnn.leaky_relu(GraphConv(out_channels=H)(x, ei))
        h = fnn.leaky_relu(GraphConv(out_channels=H)(h, ei))
        pool = MemPooling(in_channels=H, out_channels=H, heads=4,
                          num_clusters=4)
        hp, s1 = pool(h, batch=batch, batch_size=num_graphs)
        pool2 = MemPooling(in_channels=H, out_channels=C, heads=4,
                           num_clusters=1)
        hp2, s2 = pool2(hp)
        return hp2.squeeze(1), MemPooling.kl_loss(s1) + \
            MemPooling.kl_loss(s2)


def main():
    ds = pgt.datasets.FakeDataset(num_graphs=48, avg_num_nodes=25,
                                  avg_degree=4, num_channels=16,
                                  num_classes=C, task='graph')
    graphs = [ds[i] for i in range(len(ds))]
    b = Batch.from_data_list(graphs)
    coo = getattr(b.edge_index, 'coo', b.edge_index)
    x = jnp.asarray(np.asarray(b.x))
    ei = jnp.asarray(np.asarray(coo).astype(np.int32))
    bv = jnp.asarray(np.asarray(b.batch).astype(np.int32))
    y = jnp.asarray(np.asarray(
        [int(np.asarray(g.y).reshape(-1)[0]) for g in graphs]).astype(
            np.int32))
    ng = len(graphs)

    model = MemNet()
    params = model.init(jax.random.PRNGKey(0), x, ei, bv, ng)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, kl = model.apply(p, x, ei, bv, ng)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return ce + 0.1 * kl
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(40):
        params, opt_state, loss = step(params, opt_state)
    logits, _ = model.apply(params, x, ei, bv, ng)
    acc = float((jnp.argmax(logits, -1) == y).mean())
    print(f'loss {float(loss):.4f}, train acc {acc:.4f}')


if __name__ == '__main__':
    main()
