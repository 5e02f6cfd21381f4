"""Quantized serving: train in f32, deploy the int8 adjacency cache.

The dense cached-adjacency SpMM is HBM-bound; int8 storage halves the
bf16 stream again and runs the MXU at 2x bf16 throughput (measured
1.3x over bf16 / 1.95x over f32 per forward on v5e). Accuracy cost at
two-sided-scaled int8 is ~1% relative per SpMM — argmax agreement with
f32 inference stays >= 99% on trained models
(tests/test_int8_spmm.py).

Reference analog: serving-side quantization has no reference
equivalent; closest protocol is `examples/cpp/main.cpp` deployment.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.nn import cache_gcn_norm
from pytorch_geometric_tpu.nn.models import GCN


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=2000, avg_degree=16,
                                    num_channels=64, num_classes=7)[0]
    n = data.num_nodes
    coo = np.asarray(data.edge_index).astype(np.int32)
    # gcn-norm weights baked once (GCNConv(cached=True) protocol)
    ei_f32 = cache_gcn_norm(EdgeIndex(coo, (n, n)))
    ei_int8 = cache_gcn_norm(EdgeIndex(coo, (n, n)),
                             cache_dtype=jnp.int8)

    x = jnp.asarray(np.asarray(data.x))
    y = jnp.asarray(np.asarray(data.y).astype(np.int32))
    model = GCN(hidden_channels=64, num_layers=2, out_channels=7,
                conv_kwargs={'normalize': False,
                             'add_self_loops': False})
    params = model.init(jax.random.PRNGKey(0), x, ei_f32)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, ei):
        def loss_fn(p):
            logits = model.apply(p, x, ei)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    for epoch in range(60):          # training stays on the f32 cache
        params, opt, loss = step(params, opt, ei_f32)
    print(f'train loss {float(loss):.4f}')

    @jax.jit
    def infer(params, ei):
        return model.apply(params, x, ei)

    p32 = infer(params, ei_f32)
    p8 = infer(params, ei_int8)      # serving switches to int8
    jax.block_until_ready((p32, p8))
    agree = float((p32.argmax(-1) == p8.argmax(-1)).mean())
    print(f'argmax agreement int8 vs f32: {agree:.4f}')

    for name, ei in [('f32', ei_f32), ('int8', ei_int8)]:
        t0 = time.perf_counter()
        for _ in range(20):
            out = infer(params, ei)
        jax.block_until_ready(out)
        print(f'{name} inference: '
              f'{(time.perf_counter() - t0) / 20 * 1e3:.3f} ms')


if __name__ == '__main__':
    main()
