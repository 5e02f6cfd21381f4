"""Probe v3: isolate each op of the HGT aggregation at E=7.4M."""
import json, sys, time
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def t(fn, *args, reps=5):
    import jax.numpy as jnp
    out = fn(*args); float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return 1e3 * (time.perf_counter() - t0) / reps

def main():
    import jax, jax.numpy as jnp
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    E, N, H = 7_400_000, 387_947, 4
    F = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    msg = jnp.asarray(rng.standard_normal((E, F)).astype(np.float32))
    lg = jnp.asarray(rng.standard_normal((E, H)).astype(np.float32))
    s = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    d = jnp.asarray(np.sort(rng.integers(0, N, E).astype(np.int32)))
    rec = {}
    rec['gather_E64_ms'] = t(jax.jit(lambda x, s: x[s]), x, s)
    rec['segsum_E64_sorted_ms'] = t(jax.jit(
        lambda m, d: jax.ops.segment_sum(m, d, N,
                                         indices_are_sorted=True)), msg, d)
    rec['segsum_E64_unsorted_ms'] = t(jax.jit(
        lambda m, s: jax.ops.segment_sum(m, s, N)), msg, s)
    rec['segmax_E4_sorted_ms'] = t(jax.jit(
        lambda l, d: jax.ops.segment_max(l, d, N,
                                         indices_are_sorted=True)), lg, d)
    rec['segsum_E4_sorted_ms'] = t(jax.jit(
        lambda l, d: jax.ops.segment_sum(l, d, N,
                                         indices_are_sorted=True)), lg, d)
    rec['exp_E4_ms'] = t(jax.jit(lambda l: jnp.exp(l)), lg)
    rec['gather_N4_by_d_ms'] = t(jax.jit(
        lambda m, d: m[d]), jnp.zeros((N, H)), d)
    from pytorch_geometric_tpu.ops.pallas_spmm import segment_sum_sorted
    try:
        rec['pallas_segsum_E64_ms'] = t(jax.jit(
            lambda m, d: segment_sum_sorted(m, d, N)), msg, d)
    except Exception as ex:
        rec['pallas_err'] = str(ex)[:120]
    rec['backend'] = jax.default_backend()
    print(json.dumps(rec))

if __name__ == '__main__':
    main()
