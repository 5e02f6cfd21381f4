"""Knowledge-graph embedding with TransE + Hits@10 evaluation
(reference ``examples/kge_fb15k_237.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.nn.kge import TransE, KGEModel

N_ENT, N_REL, N_TRIPLES = 500, 12, 4000


def main():
    rng = np.random.default_rng(0)
    h = rng.integers(0, N_ENT, N_TRIPLES)
    r = rng.integers(0, N_REL, N_TRIPLES)
    t = (h + r * 7 + rng.integers(0, 5, N_TRIPLES)) % N_ENT  # structured
    model = TransE(num_nodes=N_ENT, num_relations=N_REL,
                   hidden_channels=32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(h[:2]),
                        jnp.asarray(r[:2]), jnp.asarray(t[:2]))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, h, r, t, hn, rn, tn):
        def loss_fn(p):
            pos = model.apply(p, h, r, t)
            neg = model.apply(p, hn, rn, tn)
            return KGEModel.margin_loss(pos, neg)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    B = 512
    for epoch in range(60):
        sel = rng.integers(0, N_TRIPLES, B)
        hn, rn, tn = KGEModel.random_sample(rng, h[sel], r[sel], t[sel],
                                            N_ENT)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(h[sel]), jnp.asarray(r[sel]),
            jnp.asarray(t[sel]), jnp.asarray(hn), jnp.asarray(rn),
            jnp.asarray(tn))

    # Hits@10: score each test head against all candidate tails at once
    test = rng.integers(0, N_TRIPLES, 100)
    all_t = jnp.arange(N_ENT)
    hits = 0
    score_all = jax.jit(lambda p, hh, rr: model.apply(
        p, jnp.full((N_ENT,), hh), jnp.full((N_ENT,), rr), all_t))
    for i in test:
        s = score_all(params, h[i], r[i])
        top = np.argsort(np.asarray(s))[-10:]
        hits += int(t[i] in top)
    print(f'loss {float(loss):.4f}, Hits@10 {hits / len(test):.3f}')


if __name__ == '__main__':
    main()
