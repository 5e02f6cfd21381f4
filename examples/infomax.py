"""Unsupervised Deep Graph Infomax embeddings
(reference ``examples/infomax_transductive.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn import GCNConv
from pytorch_geometric_tpu.nn.models import DeepGraphInfomax


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=600, avg_degree=10,
                                    num_channels=32, num_classes=4)[0]
    x = jnp.asarray(np.asarray(data.x))
    ei = jnp.asarray(np.asarray(data.edge_index).astype(np.int32))

    def corruption(x, ei):
        return x[::-1], ei

    model = DeepGraphInfomax(hidden_channels=64,
                             encoder=GCNConv(out_channels=64),
                             corruption=corruption)
    params = model.init(jax.random.PRNGKey(0), x, ei)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pos_z, neg_z, s, w = model.apply(p, x, ei)
            return DeepGraphInfomax.loss(pos_z, neg_z, s, w)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(50):
        params, opt_state, loss = step(params, opt_state)
    print(f'DGI loss {float(loss):.4f}')

    pos_z, *_ = model.apply(params, x, ei)
    emb = np.asarray(pos_z)
    y = np.asarray(data.y)
    w = np.linalg.lstsq(emb, np.eye(y.max() + 1)[y], rcond=None)[0]
    acc = float((np.argmax(emb @ w, -1) == y).mean())
    print(f'linear-probe accuracy {acc:.4f}')


if __name__ == '__main__':
    main()
