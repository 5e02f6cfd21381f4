"""Heterogeneous node embeddings via MetaPath2Vec random walks
(reference ``examples/hetero/metapath2vec.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.nn.models import MetaPath2Vec

N_A, N_P = 80, 200  # authors, papers


def main():
    rng = np.random.default_rng(0)
    # author communities; papers written within communities
    comm = rng.integers(0, 4, N_A)
    writes_a, writes_p = [], []
    paper_comm = rng.integers(0, 4, N_P)
    for p in range(N_P):
        authors = np.where(comm == paper_comm[p])[0]
        for a in rng.choice(authors, 2):
            writes_a.append(a)
            writes_p.append(p)
    ei = {('author', 'writes', 'paper'):
          np.stack([writes_a, writes_p]).astype(np.int32),
          ('paper', 'written_by', 'author'):
          np.stack([writes_p, writes_a]).astype(np.int32)}

    model = MetaPath2Vec(
        num_nodes_dict=(('author', N_A), ('paper', N_P)),
        metapath=(('author', 'writes', 'paper'),
                  ('paper', 'written_by', 'author')),
        embedding_dim=32, walk_length=6, context_size=3)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.sgd(0.05)
    opt_state = tx.init(params)
    host_rng = np.random.default_rng(0)

    @jax.jit
    def step(params, opt_state, pos, neg):
        loss, grads = jax.value_and_grad(MetaPath2Vec.loss)(params, pos,
                                                            neg)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = np.arange(N_A)
    for epoch in range(15):
        pos = model.pos_sample(host_rng, ei, batch)
        neg = model.neg_sample(host_rng, batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(pos), jnp.asarray(neg))
    print(f'final skip-gram loss {float(loss):.4f}')

    emb = np.asarray(model.apply(params, 'author'))
    w = np.linalg.lstsq(emb, np.eye(4)[comm], rcond=None)[0]
    acc = float((np.argmax(emb @ w, -1) == comm).mean())
    print(f'author-community linear probe {acc:.4f}')


if __name__ == '__main__':
    main()
