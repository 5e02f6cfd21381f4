"""Molecular property regression with AttentiveFP on synthetic
molecules (reference ``examples/attentive_fp.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.nn.models import AttentiveFP

N_ATOMS, E, FX, FE = 24, 60, 16, 6


def make_mol(rng):
    x = rng.standard_normal((N_ATOMS, FX)).astype(np.float32)
    coo = np.stack([rng.integers(0, N_ATOMS, E),
                    rng.integers(0, N_ATOMS, E)]).astype(np.int32)
    ea = rng.standard_normal((E, FE)).astype(np.float32)
    # synthetic target: degree-weighted feature sum (learnable signal)
    deg = np.bincount(coo[1], minlength=N_ATOMS)
    yv = float((x[:, 0] * deg).sum() / N_ATOMS)
    return x, coo, ea, yv


def main():
    rng = np.random.default_rng(0)
    mols = [make_mol(rng) for _ in range(64)]
    model = AttentiveFP(in_channels=FX, hidden_channels=64,
                        out_channels=1, edge_dim=FE, num_layers=2,
                        num_timesteps=2)
    x0, c0, e0, _ = mols[0]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                        jnp.asarray(c0), jnp.asarray(e0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, coo, ea, yv):
        def loss_fn(p):
            pred = model.apply(p, x, coo, ea)[0, 0]
            return (pred - yv) ** 2
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(6):
        tot = 0.0
        for x, coo, ea, yv in mols:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x), jnp.asarray(coo),
                jnp.asarray(ea), yv)
            tot += float(loss)
        print(f'epoch {epoch}: mse {tot / len(mols):.4f}')


if __name__ == '__main__':
    main()
