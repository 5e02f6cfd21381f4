"""Low-latency inference serving: AOT-compile once, serve padded
fixed-shape batches, report latency percentiles.

The TPU serving recipe this demonstrates:
  * pad every request batch into one of a few static shape buckets so
    the compiled program cache always hits (the reference needs
    `transforms.Pad` + `to_fixed_size` for this; here the loaders and
    `bucket()` below do it by construction);
  * `jit(...).lower(...).compile()` ahead of time — first-request
    latency equals steady-state latency;
  * `donate_argnums` is unnecessary for inference (no state), so the
    same executable serves concurrent callers.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn.models import GraphSAGE

BUCKETS = (256, 512, 1024)     # padded node counts
E_PER_N = 8


def bucket(n):
    for b in BUCKETS:
        if n <= b:
            return b
    raise ValueError(f'request too large: {n}')


def pad_request(x, coo, nb):
    """Pad a request graph into its bucket: extra edges point both
    endpoints at nb (the sentinel every segment op drops)."""
    n, e = x.shape[0], coo.shape[1]
    eb = nb * E_PER_N
    x_p = np.zeros((nb, x.shape[1]), np.float32)
    x_p[:n] = x
    coo_p = np.full((2, eb), nb, np.int32)
    k = min(e, eb)          # truncate requests past the edge budget
    coo_p[:, :k] = coo[:, :k]
    return jnp.asarray(x_p), jnp.asarray(coo_p), n


def main():
    model = GraphSAGE(hidden_channels=64, num_layers=2, out_channels=16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((BUCKETS[0], 32)).astype(
        np.float32))
    c0 = jnp.asarray(rng.integers(0, BUCKETS[0],
                                  (2, BUCKETS[0] * E_PER_N)).astype(
                                      np.int32))
    params = model.init(jax.random.PRNGKey(0), x0, c0)

    # AOT-compile one executable per bucket
    def fwd(params, x, coo):
        return model.apply(params, x, coo)

    exes = {}
    t0 = time.perf_counter()
    for nb in BUCKETS:
        xs = jax.ShapeDtypeStruct((nb, 32), jnp.float32)
        cs = jax.ShapeDtypeStruct((2, nb * E_PER_N), jnp.int32)
        exes[nb] = jax.jit(fwd).lower(params, xs, cs).compile()
    print(f'AOT-compiled {len(BUCKETS)} buckets in '
          f'{time.perf_counter() - t0:.1f}s')

    # serve 200 random-size requests, measure per-request latency
    lats = []
    for _ in range(200):
        n = int(rng.integers(40, BUCKETS[-1]))
        x = rng.standard_normal((n, 32)).astype(np.float32)
        coo = rng.integers(0, n, (2, n * 6)).astype(np.int32)
        t0 = time.perf_counter()
        nb = bucket(n)
        xp, cp, n_real = pad_request(x, coo, nb)
        out = exes[nb](params, xp, cp)
        out = np.asarray(out[:n_real])       # slice off padding
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.sort(np.asarray(lats))
    print(f'latency ms: p50={lats[100]:.2f} p90={lats[180]:.2f} '
          f'p99={lats[198]:.2f} (backend={jax.default_backend()})')


if __name__ == '__main__':
    main()
