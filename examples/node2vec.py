"""Unsupervised node embeddings via Node2Vec random walks
(reference ``examples/node2vec.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn.models import Node2Vec


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=500, avg_degree=8,
                                    num_classes=4)[0]
    n = data.num_nodes
    coo = np.asarray(data.edge_index)
    model = Node2Vec(num_nodes=n, embedding_dim=32, walk_length=10,
                     context_size=5, walks_per_node=4)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.sgd(0.025)
    opt_state = tx.init(params)
    host_rng = np.random.default_rng(0)

    @jax.jit
    def step(params, opt_state, pos, neg):
        loss, grads = jax.value_and_grad(Node2Vec.loss)(params, pos, neg)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = np.arange(n)
    for epoch in range(8):
        pos = model.pos_sample(host_rng, coo, batch)
        neg = model.neg_sample(host_rng, batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(pos), jnp.asarray(neg))
        print(f'epoch {epoch}: loss {float(loss):.4f}')

    emb = np.asarray(model.apply(params))
    # logistic-regression probe on the learned embeddings
    y = np.asarray(data.y)
    w = np.linalg.lstsq(emb, np.eye(y.max() + 1)[y], rcond=None)[0]
    acc = float((np.argmax(emb @ w, -1) == y).mean())
    print(f'linear-probe accuracy {acc:.4f}')


if __name__ == '__main__':
    main()
