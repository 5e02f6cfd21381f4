"""SIGN: precomputed diffusion features + plain MLP — all graph work is
one offline transform, the train step is pure dense compute (ideal for
TPU). Reference ``examples/sign.py``."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
import pytorch_geometric_tpu.transforms as T
from pytorch_geometric_tpu.nn.models import MLP

K = 3


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=1000, avg_degree=10,
                                    num_channels=32, num_classes=6)[0]
    data = T.SIGN(K=K)(data)
    n = data.num_nodes
    feats = [jnp.asarray(np.asarray(data.x))] + [
        jnp.asarray(np.asarray(getattr(data, f'x{i}')))
        for i in range(1, K + 1)]
    x = jnp.concatenate(feats, -1)
    y = jnp.asarray(np.asarray(data.y).astype(np.int32))
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray(rng.random(n) < 0.6)

    model = MLP(channel_list=[x.shape[1], 128, 6])
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            l = optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, x), y)
            return jnp.where(train_mask, l, 0).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(100):
        params, opt_state, loss = step(params, opt_state)
    acc = float((jnp.argmax(model.apply(params, x), -1) == y)
                [~train_mask].mean())
    print(f'loss {float(loss):.4f}, held-out acc {acc:.4f}')


if __name__ == '__main__':
    main()
