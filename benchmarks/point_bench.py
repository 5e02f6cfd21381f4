"""100k-point KNN / FPS benchmark (VERDICT round-1 item 10).

The dense [N, N] expansion at 100k points would allocate 40 GB; the
tiled path keeps peak memory at O(QT * XT) while every distance tile is
still one MXU matmul. Prints one JSON line per probe.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.nn.pool.point import fps, knn_graph

N, D, K = 100_000, 3, 16


def main():
    print(json.dumps({'backend': jax.default_backend()}), flush=True)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

    f = jax.jit(lambda p: knn_graph(p, K)[0])
    out = f(pos)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(pos)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({'probe': f'knn_graph_{N//1000}k_k{K}',
                      'seconds': round(dt, 3),
                      'pairs_per_s': round(N * N / dt / 1e9, 2),
                      'unit_pairs': 'G'}), flush=True)

    g = jax.jit(lambda p: fps(p, num_samples=1024))
    out = g(pos)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(pos)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({'probe': f'fps_{N//1000}k_1024',
                      'seconds': round(dt, 3)}), flush=True)


if __name__ == '__main__':
    main()
