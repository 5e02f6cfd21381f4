"""Point-cloud classification with DynamicEdgeConv (DGCNN): the kNN
graph is rebuilt from features every layer
(reference ``examples/dgcnn_classification.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as fnn

from pytorch_geometric_tpu.nn import DynamicEdgeConv, global_max_pool
from pytorch_geometric_tpu.nn.models import MLP

B, N_PTS, C = 16, 64, 4


def make_clouds(rng, n_graphs):
    """Synthetic shapes: sphere / cube / plane / line point clouds."""
    xs, ys = [], []
    for i in range(n_graphs):
        cls = int(rng.integers(0, C))
        p = rng.standard_normal((N_PTS, 3)).astype(np.float32)
        if cls == 0:
            p /= np.linalg.norm(p, axis=1, keepdims=True)  # sphere
        elif cls == 1:
            p = np.clip(p, -1, 1)                          # cube-ish
        elif cls == 2:
            p[:, 2] = 0.0                                  # plane
        else:
            p[:, 1:] = 0.0                                 # line
        xs.append(p)
        ys.append(cls)
    return np.stack(xs), np.array(ys, np.int64)


class DGCNN(fnn.Module):
    @fnn.compact
    def __call__(self, pos, batch, num_graphs):
        h = DynamicEdgeConv(nn=MLP(channel_list=[2 * 3, 64, 64]), k=8)(
            pos, batch=batch)
        h = DynamicEdgeConv(nn=MLP(channel_list=[2 * 64, 128]), k=8)(
            h, batch=batch)
        g = global_max_pool(h, batch, size=num_graphs)
        return MLP(channel_list=[128, 64, C])(g)


def main():
    rng = np.random.default_rng(0)
    pos, y = make_clouds(rng, B * 4)
    pos_flat = jnp.asarray(pos.reshape(-1, 3))
    batch = jnp.asarray(np.repeat(np.arange(B * 4), N_PTS).astype(
        np.int32))
    yj = jnp.asarray(y.astype(np.int32))

    model = DGCNN()
    params = model.init(jax.random.PRNGKey(0), pos_flat, batch, B * 4)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, pos_flat, batch, B * 4)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yj).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(40):
        params, opt_state, loss = step(params, opt_state)
    logits = model.apply(params, pos_flat, batch, B * 4)
    acc = float((jnp.argmax(logits, -1) == yj).mean())
    print(f'loss {float(loss):.4f}, train acc {acc:.4f}')


if __name__ == '__main__':
    main()
