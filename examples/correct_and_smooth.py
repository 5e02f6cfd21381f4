"""MLP base predictor + Correct&Smooth post-processing
(reference ``examples/correct_and_smooth.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn.models import MLP, CorrectAndSmooth


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=800, avg_degree=12,
                                    num_channels=32, num_classes=5)[0]
    n = data.num_nodes
    x = jnp.asarray(np.asarray(data.x))
    y = np.asarray(data.y)
    ei = jnp.asarray(np.asarray(data.edge_index).astype(np.int32))
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray(rng.random(n) < 0.5)

    model = MLP(channel_list=[32, 64, 5])
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(0.01)
    opt_state = tx.init(params)
    yj = jnp.asarray(y.astype(np.int32))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            l = optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, x), yj)
            return jnp.where(train_mask, l, 0).sum() / train_mask.sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)

    soft = jax.nn.softmax(model.apply(params, x))
    base_acc = float((jnp.argmax(soft, -1) == yj)[~train_mask].mean())

    y_onehot = jax.nn.one_hot(yj, 5)
    cs = CorrectAndSmooth(num_correction_layers=20, correction_alpha=0.6,
                          num_smoothing_layers=20, smoothing_alpha=0.7)
    out = cs(soft, y_onehot, train_mask, ei)
    cs_acc = float((jnp.argmax(out, -1) == yj)[~train_mask].mean())
    print(f'MLP acc {base_acc:.4f} -> C&S acc {cs_acc:.4f}')


if __name__ == '__main__':
    main()
