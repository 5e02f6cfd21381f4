"""Grouped / typed GEMM strategy A/B (the pyg_lib segment_matmul role,
reference ``nn/dense/linear.py:301`` + CUTLASS grouped GEMM).

Arms: dense einsum (R-x FLOP waste), sort-and-batch bucket GEMM
(padding FLOPs), lax.ragged_dot (zero padding FLOPs — XLA's MoE
grouped-GEMM primitive).

Usage: python benchmarks/grouped_bench.py [--rows N] [--types R]
       [--features F] [--out C] [--skew {uniform,powerlaw}]
Prints one JSON line per arm.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_types(n, r, skew, rng):
    if skew == 'uniform':
        return rng.integers(0, r, n)
    # powerlaw: type frequencies ~ 1/(k+1)
    p = 1.0 / np.arange(1, r + 1)
    p /= p.sum()
    return rng.choice(r, size=n, p=p)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=262144)
    ap.add_argument('--types', type=int, default=64)
    ap.add_argument('--features', type=int, default=128)
    ap.add_argument('--out', type=int, default=128)
    ap.add_argument('--skew', default='powerlaw',
                    choices=['uniform', 'powerlaw'])
    ap.add_argument('--reps', type=int, default=20)
    args = ap.parse_args()

    from pytorch_geometric_tpu.ops import (build_ragged_layout,
                                           build_typed_layout,
                                           typed_matmul)
    rng = np.random.default_rng(0)
    n, r, f, c = args.rows, args.types, args.features, args.out
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    types_np = make_types(n, r, args.skew, rng)
    types = jnp.asarray(types_np.astype(np.int32))
    w = jnp.asarray(rng.normal(size=(r, f, c)).astype(np.float32))

    useful_flops = 2.0 * n * f * c
    platform = jax.devices()[0].platform

    arms = {}
    # dense einsum materializes [N, R, C] (plus grads): cap at ~1.5 GB
    # so the arm never OOMs the 16 GB v5e HBM at big --rows
    if r <= 64 and 4.0 * n * r * c <= 1.5e9:
        arms['dense_einsum'] = (None, useful_flops * r)
    lay_b = build_typed_layout(types_np, r)
    arms['bucket_batch'] = (lay_b, 2.0 * r * lay_b.bucket * f * c)
    lay_r = build_ragged_layout(types_np, r)
    arms['ragged_dot'] = (lay_r, useful_flops)

    base = None
    rec = {'bench': 'grouped_matmul', 'rows': n, 'types': r, 'f': f,
           'c': c, 'skew': args.skew, 'platform': platform}
    for name, (lay, flops) in arms.items():
        # close over the layout: TypedLayout.bucket is a static int
        fn = jax.jit(lambda x, t, w, lay=lay: typed_matmul(x, t, w, lay))
        dt = timeit(fn, x, types, w, reps=args.reps)
        base = base or dt
        rec[name] = {'ms': round(dt * 1e3, 3),
                     'useful_gflops_s': round(useful_flops / dt / 1e9, 1),
                     'issued_gflops_s': round(flops / dt / 1e9, 1),
                     'speedup_vs_first': round(base / dt, 2)}
    print(json.dumps(rec))


if __name__ == '__main__':
    main()
