"""HGT aggregation probe v2: edges PRESORTED by dst on the host (the
EdgeIndex CSC order a loader/fill_cache provides) — no device argsort.
Candidates: XLA sorted segment ops vs the Pallas MXU sorted segment-sum
vs the unsorted baseline."""
import json, sys, time
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))

def t(fn, *args, reps=5):
    out = fn(*args); force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps

def main():
    import jax, jax.numpy as jnp
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    E, N, H, D = 7_400_000, 387_947, 4, 16
    F = H * D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    src_np = rng.integers(0, N, E).astype(np.int32)
    dst_np = np.sort(rng.integers(0, N, E).astype(np.int32))   # presorted
    src = jnp.asarray(src_np); dst = jnp.asarray(dst_np)
    from pytorch_geometric_tpu.ops import softmax as segment_softmax

    def logits(x, s, d):
        k = x[s].reshape(E, H, D); q = x[d].reshape(E, H, D)
        return (k * q).sum(-1)

    rec = {}
    @jax.jit
    def unsorted(x, s, d):
        a = segment_softmax(logits(x, s, d), d, N)
        msg = x[s].reshape(E, H, D) * a[..., None]
        return jax.ops.segment_sum(msg.reshape(E, F), d, N)
    rec['unsorted_ms'] = 1e3 * t(unsorted, x, src, dst)

    @jax.jit
    def xla_sorted(x, s, d):
        lg = logits(x, s, d)
        mx = jax.ops.segment_max(lg, d, N, indices_are_sorted=True)
        mx = jnp.where(jnp.isfinite(mx), mx, 0)
        e = jnp.exp(lg - mx[d])
        sm = jax.ops.segment_sum(e, d, N, indices_are_sorted=True)
        a = e / (sm[d] + 1e-16)
        msg = x[s].reshape(E, H, D) * a[..., None]
        return jax.ops.segment_sum(msg.reshape(E, F), d, N,
                                   indices_are_sorted=True)
    rec['xla_sorted_ms'] = 1e3 * t(xla_sorted, x, src, dst)

    from pytorch_geometric_tpu.ops.pallas_spmm import segment_sum_sorted
    @jax.jit
    def pallas_sorted(x, s, d):
        lg = logits(x, s, d)
        mx = jax.ops.segment_max(lg, d, N, indices_are_sorted=True)
        mx = jnp.where(jnp.isfinite(mx), mx, 0)
        e = jnp.exp(lg - mx[d])
        sm = segment_sum_sorted(e, d, N)
        a = e / (sm[d] + 1e-16)
        msg = x[s].reshape(E, H, D) * a[..., None]
        return segment_sum_sorted(msg.reshape(E, F), d, N)
    try:
        rec['pallas_sorted_ms'] = 1e3 * t(pallas_sorted, x, src, dst)
    except Exception as ex:
        rec['pallas_error'] = str(ex)[:150]

    rec['backend'] = jax.default_backend()
    print(json.dumps(rec))

if __name__ == '__main__':
    main()
