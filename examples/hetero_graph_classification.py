"""Hetero graph classification with HeteroBatch collation.

Demonstrates the padded per-type disjoint-union batching
(``data/hetero_batch.py``): the DataLoader buckets per-node-type and
per-edge-type budgets so every batch compiles to the same program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as fnn

from pytorch_geometric_tpu.data import HeteroData
from pytorch_geometric_tpu.loader import DataLoader
from pytorch_geometric_tpu.nn.conv import HeteroConv, SAGEConv
from pytorch_geometric_tpu.nn.pool import global_mean_pool

ET = ('author', 'writes', 'paper')


def make_graph(rng, label):
    n_p = int(rng.integers(4, 9))
    n_a = int(rng.integers(2, 6))
    e = int(rng.integers(4, 12))
    d = HeteroData()
    d['paper'].x = (rng.normal(size=(n_p, 8))
                    + 2.0 * label).astype(np.float32)
    d['author'].x = rng.normal(size=(n_a, 8)).astype(np.float32)
    d[ET].edge_index = np.stack([rng.integers(0, n_a, e),
                                 rng.integers(0, n_p, e)])
    d.y = np.int32(label)   # graph-level label (global store)
    return d


class Net(fnn.Module):
    @fnn.compact
    def __call__(self, x_dict, ei_dict, batch, bs, mask):
        h = HeteroConv({ET: SAGEConv(out_channels=16)},
                       name='conv')(x_dict, ei_dict)
        g = global_mean_pool(h['paper'], batch, bs, mask=mask)
        return fnn.Dense(2, name='head')(g)


def main():
    rng = np.random.default_rng(0)
    graphs = [make_graph(rng, i % 2) for i in range(32)]
    loader = DataLoader(graphs, batch_size=8, shuffle=True, seed=1)

    model = Net()
    b0 = next(iter(loader))

    def unpack(b):
        return (b.x_dict, b.edge_index_dict, b['paper'].batch, 8,
                b.node_mask_dict()['paper'])

    params = model.init(jax.random.PRNGKey(0), *unpack(b0))
    tx = optax.adam(5e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xd, eid, batch, mask, y, ymask):
        def loss_fn(p):
            logits = model.apply(p, xd, eid, batch, 8, mask)
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, y)
            return jnp.where(ymask, l, 0).sum() / ymask.sum()
        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    for epoch in range(10):
        for b in loader:
            xd, eid, batch, bs, mask = unpack(b)
            y = np.zeros(8, np.int32)
            y[:b.num_graphs] = np.asarray(b.y)
            ymask = jnp.arange(8) < b.num_graphs
            params, opt, loss = step(params, opt, xd, eid, batch, mask,
                                     jnp.asarray(y), ymask)
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
