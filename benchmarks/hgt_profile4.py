"""Probe v4: fixes for the narrow-[E,4] segment-op wall."""
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
    rng = np.random.default_rng(0)
    lg = jnp.asarray(rng.standard_normal((E, H)).astype(np.float32))
    d_np = np.sort(rng.integers(0, N, E).astype(np.int32))
    d = jnp.asarray(d_np)
    rec = {}
    rec['segmax_E4_pad128_ms'] = t(jax.jit(
        lambda l, d: jax.ops.segment_max(
            jnp.pad(l, ((0, 0), (0, 124)), constant_values=-np.inf),
            d, N, indices_are_sorted=True)[:, :H]), lg, d)
    rec['segsum_E4_pad128_ms'] = t(jax.jit(
        lambda l, d: jax.ops.segment_sum(
            jnp.pad(l, ((0, 0), (0, 124))), d, N,
            indices_are_sorted=True)[:, :H]), lg, d)
    rec['segmax_E_1d_ms'] = t(jax.jit(
        lambda l, d: jax.ops.segment_max(l[:, 0], d, N,
                                         indices_are_sorted=True)), lg, d)
    # fused blocked kernel at this shape
    from pytorch_geometric_tpu import EdgeIndex
    from pytorch_geometric_tpu.ops.sddmm import (edge_softmax,
                                                 fused_softmax_available)
    src_np = rng.integers(0, N, E).astype(np.int32)
    coo = np.stack([src_np, d_np])
    ei = EdgeIndex(coo, (N, N)).fill_cache(blocked=True)
    rec['fused_available'] = bool(fused_softmax_available(ei))
    if rec['fused_available']:
        lg_b = lg
        rec['fused_edge_softmax_ms'] = t(jax.jit(
            lambda l: edge_softmax(ei, l)), lg_b)
    rec['backend'] = jax.default_backend()
    print(json.dumps(rec))

if __name__ == '__main__':
    main()
