"""GraphMixer temporal link prediction: LinkEncoder (MLP-Mixer over each
node's k latest links) + NodeEncoder (temporal 1-hop mean), scored with
an MLP over the pair (the reference ``nn/models/graph_mixer.py``
workflow). Synthetic task: community members keep interacting —
predict which pairs link next."""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.nn.models.graph_mixer import (LinkEncoder,
                                                         NodeEncoder)

N, COMM, EVENTS, F, K = 80, 4, 1200, 8, 6


class GraphMixerLP(fnn.Module):
    @fnn.compact
    def __call__(self, x, coo, edge_attr, edge_time, seed_time, pairs):
        link = LinkEncoder(k=K, in_channels=F, hidden_channels=32,
                           out_channels=32, time_channels=16,
                           name='link_enc')(coo, edge_attr, edge_time,
                                            seed_time)
        node = NodeEncoder(time_window=30, name='node_enc')(
            x, coo, edge_time, seed_time)
        h = jnp.concatenate([link, node], -1)
        src, dst = pairs[0], pairs[1]
        pair = jnp.concatenate([h[src] * h[dst], h[src] + h[dst]], -1)
        pair = fnn.relu(fnn.Dense(64, name='lin1')(pair))
        return fnn.Dense(1, name='lin2')(pair)[:, 0]


def main():
    rng = np.random.default_rng(0)
    comm = rng.integers(0, COMM, N)
    # history: intra-community events at random times
    srcs = rng.integers(0, N, EVENTS)
    dsts = np.array([rng.choice(np.where(comm == comm[s])[0])
                     for s in srcs])
    times = np.sort(rng.uniform(0, 100, EVENTS)).astype(np.float32)
    attr = rng.standard_normal((EVENTS, F)).astype(np.float32)
    coo = jnp.asarray(np.stack([srcs, dsts]).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((N, 32)).astype(np.float32))

    # queries at t0=100: positives intra-community, negatives across
    q = 256
    ps = rng.integers(0, N, q)
    pos = np.array([rng.choice(np.where(comm == comm[s])[0]) for s in ps])
    neg = np.array([rng.choice(np.where(comm != comm[s])[0]) for s in ps])
    pairs = jnp.asarray(np.stack([np.concatenate([ps, ps]),
                                  np.concatenate([pos, neg])])
                        .astype(np.int32))
    y = jnp.asarray(np.concatenate([np.ones(q), np.zeros(q)])
                    .astype(np.float32))
    seed_time = jnp.full((N,), 100.0)

    model = GraphMixerLP()
    args = (x, coo, jnp.asarray(attr), jnp.asarray(times), seed_time,
            pairs)
    params = model.init(jax.random.PRNGKey(0), *args)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logit = model.apply(p, *args)
            return optax.sigmoid_binary_cross_entropy(logit, y).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for epoch in range(120):
        params, opt, loss = step(params, opt)
    pred = model.apply(params, *args) > 0
    acc = (pred == (y > 0.5)).mean()
    print(f'loss {float(loss):.4f} acc {float(acc):.3f}')
    assert acc > 0.85


if __name__ == '__main__':
    main()
