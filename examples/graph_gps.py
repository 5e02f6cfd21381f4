"""GraphGPS-style model: GPSConv (local MPNN + global attention) with
random-walk positional encodings on graph classification
(reference ``examples/graph_gps.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as fnn

import pytorch_geometric_tpu as pgt
import pytorch_geometric_tpu.transforms as T
from pytorch_geometric_tpu.data import Batch
from pytorch_geometric_tpu.nn import GPSConv, SAGEConv, global_add_pool

H, C = 64, 2


class GPS(fnn.Module):
    @fnn.compact
    def __call__(self, x, pe, ei, batch, num_graphs):
        h = fnn.Dense(H - pe.shape[1])(x)
        h = jnp.concatenate([h, pe], -1)
        for _ in range(2):
            h = GPSConv(channels=H, conv=SAGEConv(out_channels=H),
                        heads=4)(h, ei, batch=batch)
        g = global_add_pool(h, batch, size=num_graphs)
        return fnn.Dense(C)(g)


def main():
    pe_t = T.AddRandomWalkPE(walk_length=8)
    ds = pgt.datasets.FakeDataset(num_graphs=64, avg_num_nodes=30,
                                  avg_degree=4, num_channels=16,
                                  num_classes=C, task='graph',
                                  transform=pe_t)
    graphs = [ds[i] for i in range(len(ds))]
    model = GPS()

    def pack(gs):
        b = Batch.from_data_list(gs)
        coo = getattr(b.edge_index, 'coo', b.edge_index)
        return (jnp.asarray(np.asarray(b.x)),
                jnp.asarray(np.asarray(b.random_walk_pe)),
                jnp.asarray(np.asarray(coo).astype(np.int32)),
                jnp.asarray(np.asarray(b.batch).astype(np.int32)),
                jnp.asarray(np.asarray(
                    [int(np.asarray(g.y).reshape(-1)[0]) for g in gs])
                    .astype(np.int32)))

    x, pe, ei, bv, y = pack(graphs[:48])
    params = model.init(jax.random.PRNGKey(0), x, pe, ei, bv, 48)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, pe, ei, bv, y):
        def loss_fn(p):
            logits = model.apply(p, x, pe, ei, bv, y.shape[0])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(30):
        params, opt_state, loss = step(params, opt_state, x, pe, ei, bv, y)
    xt, pet, eit, bt, yt = pack(graphs[48:])
    logits = model.apply(params, xt, pet, eit, bt, yt.shape[0])
    acc = float((jnp.argmax(logits, -1) == yt).mean())
    print(f'train loss {float(loss):.4f}, test acc {acc:.4f}')


if __name__ == '__main__':
    main()
