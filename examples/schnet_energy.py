"""SchNet energy regression on synthetic atomic configurations
(reference ``examples/qm9_pretrained_schnet.py`` flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.nn.models import SchNet

N_ATOMS = 10


def make_conf(rng):
    z = rng.integers(1, 6, N_ATOMS).astype(np.int32)
    pos = rng.standard_normal((N_ATOMS, 3)).astype(np.float32) * 1.5
    # synthetic energy: pairwise Lennard-Jones-ish sum (smooth in pos)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1) + np.eye(
        N_ATOMS)
    e = float((1.0 / d ** 2 - 0.5 / d).sum() / N_ATOMS)
    return z, pos, e


def main():
    rng = np.random.default_rng(0)
    confs = [make_conf(rng) for _ in range(48)]
    model = SchNet(hidden_channels=64, num_filters=64,
                   num_interactions=3, num_gaussians=25,
                   cutoff=5.0, max_num_neighbors=8)
    z0, p0, _ = confs[0]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(z0),
                        jnp.asarray(p0))
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, z, pos, ev):
        def loss_fn(p):
            pred = model.apply(p, z, pos)[0, 0]
            return (pred - ev) ** 2
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(6):
        tot = 0.0
        for z, pos, ev in confs:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(z), jnp.asarray(pos), ev)
            tot += float(loss)
        print(f'epoch {epoch}: mse {tot / len(confs):.4f}')


if __name__ == '__main__':
    main()
