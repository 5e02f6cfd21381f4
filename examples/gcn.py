"""Full-batch GCN node classification (reference ``examples/gcn.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn.models import GCN


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=1000, avg_degree=10,
                                    num_channels=64, num_classes=10)[0]
    n = data.num_nodes
    # one-knob dispatch: cache_gcn_norm(auto=True) bakes the normalised
    # adjacency into whichever regime fits this graph + device (dense
    # MXU cache here; BSR / chunked / gather on bigger graphs) — no
    # manual mode selection (see ops.spmm.spmm_regime).
    from pytorch_geometric_tpu.nn import cache_gcn_norm
    ei = cache_gcn_norm(
        pgt.EdgeIndex(np.asarray(data.edge_index).astype(np.int32),
                      (n, n)), auto=True)
    x = jnp.asarray(np.asarray(data.x))
    y = jnp.asarray(np.asarray(data.y))
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray(rng.random(n) < 0.6)

    model = GCN(hidden_channels=64, num_layers=2, out_channels=10,
                conv_kwargs={'normalize': False,
                             'add_self_loops': False})
    params = model.init(jax.random.PRNGKey(0), x, ei)
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, ei)
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.where(train_mask, l, 0).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(100):
        params, opt_state, loss = step(params, opt_state)
    logits = model.apply(params, x, ei)
    acc = float((jnp.argmax(logits, -1) == y)[~train_mask].mean())
    print(f'final loss {float(loss):.4f}, held-out acc {acc:.4f}')


if __name__ == '__main__':
    main()
