"""Signed link prediction with SignedGCN on a synthetic signed graph
(reference ``examples/signed_gcn.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.nn.models import SignedGCN

N, E_POS, E_NEG = 300, 1200, 800


def main():
    rng = np.random.default_rng(0)
    # two camps: intra-camp edges positive, inter-camp negative
    camp = rng.integers(0, 2, N)
    x = np.concatenate([rng.standard_normal((N, 14)),
                        camp[:, None].astype(np.float64)],
                       1).astype(np.float32)

    def sample_edges(e, same):
        s = rng.integers(0, N, 3 * e)
        d = rng.integers(0, N, 3 * e)
        m = (camp[s] == camp[d]) == same
        return np.stack([s[m][:e], d[m][:e]]).astype(np.int32)

    pos_e, neg_e = sample_edges(E_POS, True), sample_edges(E_NEG, False)
    n_test_p, n_test_n = E_POS // 5, E_NEG // 5
    pos_tr, pos_te = pos_e[:, n_test_p:], pos_e[:, :n_test_p]
    neg_tr, neg_te = neg_e[:, n_test_n:], neg_e[:, :n_test_n]

    model = SignedGCN(in_channels=15, hidden_channels=32, num_layers=2)
    xp, pj, nj = jnp.asarray(x), jnp.asarray(pos_tr), jnp.asarray(neg_tr)
    params = model.init(jax.random.PRNGKey(0), xp, pj, nj)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            z = model.apply(p, xp, pj, nj)
            return (SignedGCN.pos_embedding_loss(z, pj)
                    + SignedGCN.neg_embedding_loss(z, nj))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(60):
        params, opt_state, loss = step(params, opt_state)

    z = np.asarray(model.apply(params, xp, pj, nj))

    # linear sign discriminator on edge features (the reference trains
    # a 3-class head; a least-squares probe suffices for the demo)
    def feats(e):
        return np.concatenate([z[e[0]], z[e[1]], z[e[0]] * z[e[1]]], -1)

    ftr = np.concatenate([feats(pos_tr), feats(neg_tr)])
    ytr = np.concatenate([np.ones(pos_tr.shape[1]),
                          -np.ones(neg_tr.shape[1])])
    wlin = np.linalg.lstsq(ftr, ytr, rcond=None)[0]
    sp, sn = feats(pos_te) @ wlin, feats(neg_te) @ wlin
    auc = float((sp[:, None] > sn[None, :]).mean())
    print(f'loss {float(loss):.4f}, sign-prediction AUC {auc:.4f}')


if __name__ == '__main__':
    main()
