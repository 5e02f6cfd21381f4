"""GAT training on the fused MXU attention path.

The blocked edge layout (``EdgeIndex.fill_cache(blocked=True)``) lets
GATConv/GATv2Conv/TransformerConv run softmax-weighted aggregation as a
single Pallas segment-sum over ``[p | p*v]`` columns — 4.2x over the
XLA scatter path on v5e (see ``ops/gat_fused.py``).

Self-loops are pre-added via the transform so the conv does not rewrite
the edge set at call time (which would invalidate the cached layout).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.nn.conv import GATConv
from pytorch_geometric_tpu.utils.loop import add_remaining_self_loops

import flax.linen as fnn


class GAT(fnn.Module):
    hidden: int = 64
    heads: int = 4
    classes: int = 10

    @fnn.compact
    def __call__(self, x, ei):
        # add_self_loops=False: loops were added once, host-side
        x = fnn.relu(GATConv(out_channels=self.hidden // self.heads,
                             heads=self.heads, add_self_loops=False,
                             name='conv1')(x, ei))
        return GATConv(out_channels=self.classes, heads=1,
                       add_self_loops=False, name='conv2')(x, ei)


def main():
    n, e, f = 10_000, 200_000, 64
    rng = np.random.default_rng(0)
    coo = jnp.asarray(rng.integers(0, n, (2, e)))
    coo, _ = add_remaining_self_loops(coo, num_nodes=n)
    ei = EdgeIndex(coo, (n, n)).fill_cache(blocked=True)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, n))

    model = GAT()
    params = model.init(jax.random.PRNGKey(0), x, ei)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, x, ei), y).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    params, opt, loss = step(params, opt)   # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        params, opt, loss = step(params, opt)
    jax.block_until_ready(loss)
    print(f'20 steps in {time.perf_counter() - t0:.3f}s, '
          f'loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
