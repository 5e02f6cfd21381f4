"""Temporal link prediction with TGN memory (reference
``examples/tgn.py`` flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.loader import TemporalDataLoader
from pytorch_geometric_tpu.nn.models import TGNMemory, TemporalData


def main():
    rng = np.random.default_rng(0)
    num_nodes, num_events, msg_dim = 50, 600, 8
    # synthetic event stream with recurring pair structure
    pairs = rng.integers(0, num_nodes, (40, 2))
    pick = rng.integers(0, 40, num_events)
    td = TemporalData(
        src=pairs[pick, 0], dst=pairs[pick, 1],
        t=np.sort(rng.random(num_events).astype(np.float32) * 1000),
        msg=rng.standard_normal((num_events, msg_dim)).astype(
            np.float32))
    train, val, test = td.train_val_test_split(0.15, 0.15)

    mem = TGNMemory(num_nodes=num_nodes, raw_msg_dim=msg_dim,
                    memory_dim=32, time_dim=16)
    state = mem.init_state()
    b0 = next(train.seq_batches(50))
    params = mem.init(jax.random.PRNGKey(0), state,
                      jnp.asarray(b0.src), jnp.asarray(b0.dst),
                      jnp.asarray(b0.t), jnp.asarray(b0.msg))
    import flax.linen as fnn
    link = fnn.Dense(1)
    lp = link.init(jax.random.PRNGKey(1), jnp.ones((1, 64)))
    tx = optax.adam(1e-3)
    all_p = {'mem': params, 'link': lp}
    opt = tx.init(all_p)

    @jax.jit
    def step(all_p, opt, state, src, dst, t, msg, neg_dst):
        def loss_fn(all_p):
            new_state, (zs, zd) = mem.apply(all_p['mem'], state, src,
                                            dst, t, msg)
            zneg = new_state.memory[neg_dst]
            pos = link.apply(all_p['link'],
                             jnp.concatenate([zs, zd], -1))[:, 0]
            neg = link.apply(all_p['link'],
                             jnp.concatenate([zs, zneg], -1))[:, 0]
            loss = (-jax.nn.log_sigmoid(pos).mean()
                    - jax.nn.log_sigmoid(-neg).mean())
            return loss, new_state
        (loss, new_state), g = jax.value_and_grad(
            loss_fn, has_aux=True)(all_p)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(all_p, up), opt, new_state, loss

    for epoch in range(5):
        state = mem.init_state()   # reset memory each epoch
        loader = TemporalDataLoader(train, batch_size=50,
                                    neg_sampling_ratio=1.0)
        for batch in loader:
            if len(batch.src) < 50:
                continue
            all_p, opt, state, loss = step(
                all_p, opt, state, jnp.asarray(batch.src),
                jnp.asarray(batch.dst), jnp.asarray(batch.t),
                jnp.asarray(batch.msg),
                jnp.asarray(batch.neg_dst[:50]))
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
