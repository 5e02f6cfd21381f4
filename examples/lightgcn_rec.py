"""LightGCN recommendation with BPR loss
(reference ``examples/lightgcn.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.nn.models import LightGCN

N_USERS, N_ITEMS, E = 200, 300, 2000


def main():
    rng = np.random.default_rng(0)
    n = N_USERS + N_ITEMS
    users = rng.integers(0, N_USERS, E)
    items = rng.integers(N_USERS, n, E)
    # bipartite interaction graph, both directions
    coo = np.concatenate([np.stack([users, items]),
                          np.stack([items, users])], 1).astype(np.int32)
    ei = jnp.asarray(coo)

    model = LightGCN(num_nodes=n, embedding_dim=32, num_layers=2)
    lbl0 = jnp.asarray(np.stack([users[:4], items[:4]]).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), ei, lbl0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, pos, neg):
        def loss_fn(p):
            pos_s = model.apply(p, ei, pos)
            neg_s = model.apply(p, ei, neg)
            return LightGCN.recommendation_loss(pos_s, neg_s)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    B = 256
    for epoch in range(20):
        sel = rng.integers(0, E, B)
        pos = jnp.asarray(np.stack([users[sel], items[sel]]).astype(
            np.int32))
        neg = jnp.asarray(np.stack(
            [users[sel], rng.integers(N_USERS, n, B)]).astype(np.int32))
        params, opt_state, loss = step(params, opt_state, pos, neg)
    print(f'final BPR loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
