"""Component probe for the HGT hot path at MAG shape (r4): where do
6.9 s/step go? Times (on device, scalar-forced):

  a. typed QKV projections (node-level GEMMs)
  b. per-edge gather of node-transformed K/V + logits
  c. unsorted segment_softmax + scatter aggregation (current path)
  d. device argsort-by-dst + SORTED segment path (Pallas MXU
     segment-sum candidate)
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def force(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0] if isinstance(x, tuple) else x))


def t(fn, *args, reps=5):
    import jax
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    E, N, H, D = 7_400_000, 387_947, 4, 16
    F = H * D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    W = jnp.asarray(rng.standard_normal((F, F)).astype(np.float32))

    rec = {}
    rec['a_qkv_gemm_ms'] = 1e3 * t(jax.jit(
        lambda x, W: (x @ W) + (x @ W.T)), x, W)

    @jax.jit
    def gather_logits(x, src, dst):
        k = x[src].reshape(E, H, D)
        q = x[dst].reshape(E, H, D)
        return (k * q).sum(-1)                       # [E, H]
    rec['b_gather_logits_ms'] = 1e3 * t(gather_logits, x, src, dst)

    from pytorch_geometric_tpu.ops import softmax as segment_softmax
    from pytorch_geometric_tpu.ops.scatter import scatter

    @jax.jit
    def unsorted_aggregate(x, src, dst):
        logit = gather_logits(x, src, dst)
        alpha = segment_softmax(logit, dst, N)
        msg = x[src].reshape(E, H, D) * alpha[..., None]
        return scatter(msg.reshape(E, F), dst, N, 'sum')
    rec['c_unsorted_softmax_scatter_ms'] = 1e3 * t(
        unsorted_aggregate, x, src, dst)

    @jax.jit
    def sorted_aggregate(x, src, dst):
        perm = jnp.argsort(dst)
        s, d = src[perm], dst[perm]
        logit = gather_logits(x, s, d)
        alpha = segment_softmax(logit, d, N)
        msg = x[s].reshape(E, H, D) * alpha[..., None]
        from pytorch_geometric_tpu.ops.pallas_spmm import \
            segment_sum_sorted
        return segment_sum_sorted(msg.reshape(E, F), d, N)
    try:
        rec['d_device_sort_pallas_ms'] = 1e3 * t(
            sorted_aggregate, x, src, dst)
    except Exception as e:                      # pallas path may reject
        rec['d_error'] = str(e)[:120]

    @jax.jit
    def sorted_xla(x, src, dst):
        perm = jnp.argsort(dst)
        s, d = src[perm], dst[perm]
        logit = gather_logits(x, s, d)
        alpha = segment_softmax(logit, d, N)
        msg = x[s].reshape(E, H, D) * alpha[..., None]
        return jax.ops.segment_sum(msg.reshape(E, F), d, N,
                                   indices_are_sorted=True)
    rec['e_device_sort_xla_sorted_ms'] = 1e3 * t(sorted_xla, x, src,
                                                 dst)

    rec['backend'] = jax.default_backend()
    rec['shape'] = f'E={E} N={N} F={F}'
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
