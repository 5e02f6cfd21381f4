"""SpMM roofline benchmark (BASELINE.md north-star: >= 80% of the HBM
bandwidth roofline for CSR SpMM fwd+bwd on a products-scale graph).

Usage: python benchmarks/spmm_bench.py [--nodes N] [--edges E]
       [--features F] [--xla]
Prints one JSON line per configuration with edges/s, effective GB/s and
% of the roofline (v5e: ~819 GB/s HBM).
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

HBM_GBPS = {'v5e': 819.0, 'v4': 1228.0, 'v5p': 2765.0}


def roofline_bytes(e, n, f, fwd_and_bwd=True):
    """Minimum HBM traffic: gather x (E*F), write out (N*F), read weights
    (E), backward re-gather + scatter (2*E*F + N*F)."""
    fwd = e * f * 4 + n * f * 4 + e * 4
    bwd = 2 * e * f * 4 + n * f * 4
    return fwd + (bwd if fwd_and_bwd else 0)


def ensure_backend():
    """The TPU plugin registers under a varying name ('axon' vs 'tpu')
    depending on tunnel state; fall back to auto-selection when the
    forced platform list fails."""
    try:
        jax.devices()
        return
    except RuntimeError:
        pass
    try:
        from jax._src import xla_bridge
        xla_bridge._clear_backends()
    except Exception:
        pass
    jax.config.update('jax_platforms', '')
    jax.devices()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nodes', type=int, default=250_000)
    ap.add_argument('--edges', type=int, default=5_000_000)
    ap.add_argument('--features', type=int, default=128)
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--xla', action='store_true',
                    help='force the XLA path (no Pallas)')
    ap.add_argument('--windowed', action='store_true',
                    help='force the sorted-chunk windowed layout '
                         '(BSR-vs-windowed A/B, VERDICT r5 #5)')
    ap.add_argument('--bsr', action='store_true',
                    help='cache the block-sparse adjacency '
                         '(ops/bsr_spmm.py); weights are baked, so the '
                         'timed grad is d/dx only')
    ap.add_argument('--clustered', type=int, default=0, metavar='CSIZE',
                    help='generate a clustered graph (communities of '
                         'CSIZE nodes, 90%% intra) instead of uniform '
                         'random — models a partitioner-reordered graph')
    ap.add_argument('--powerlaw', action='store_true',
                    help='scale-free degree distribution + scrambled '
                         'ids (exercises the auto reorder in the BSR '
                         'path)')
    ap.add_argument('--int8', action='store_true',
                    help='quantized inference cache (per-row int8 + f32 '
                         'scales); forward-only (implies --infer)')
    ap.add_argument('--infer', action='store_true',
                    help='time the forward pass only (inference)')
    ap.add_argument('--bf16', action='store_true',
                    help='store the cached dense adjacency in bf16 '
                         '(halves the dominant HBM stream)')
    ap.add_argument('--dense', action='store_true',
                    help='cache the dense [N,N] adjacency')
    ap.add_argument('--gen', default='v5e')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()
    import os
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    if args.windowed and (args.bsr or args.dense or args.int8):
        ap.error('--windowed is exclusive with --bsr/--dense/--int8 '
                 '(one layout per record)')
    if args.xla:
        os.environ['PGT_DISABLE_PALLAS'] = '1'
    ensure_backend()
    if jax.default_backend() == 'cpu':
        # don't interpret a multi-million-edge Pallas kernel on CPU
        os.environ.pop('PGT_FORCE_PALLAS', None)

    from pytorch_geometric_tpu import EdgeIndex
    from pytorch_geometric_tpu.ops import spmm

    n, e, f = args.nodes, args.edges, args.features
    rng = np.random.default_rng(0)
    if args.clustered:
        cs = args.clustered
        n_comm = max(n // cs, 1)
        comm = rng.integers(0, n_comm, e)
        intra = rng.random(e) < 0.9
        s_loc = comm * cs + rng.integers(0, cs, e)
        d_loc = comm * cs + rng.integers(0, cs, e)
        s_rnd = rng.integers(0, n, e)
        d_rnd = rng.integers(0, n, e)
        coo_np = np.stack([np.where(intra, s_loc, s_rnd),
                           np.where(intra, d_loc, d_rnd)])
        coo_np = np.minimum(coo_np, n - 1).astype(np.int32)
    elif args.powerlaw:
        pw = np.arange(1, n + 1) ** -0.9
        pw /= pw.sum()
        sc = rng.permutation(n)
        coo_np = np.stack([sc[rng.choice(n, e, p=pw)],
                           sc[rng.choice(n, e, p=pw)]]).astype(np.int32)
    else:
        coo_np = rng.integers(0, n, (2, e)).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    w_np = rng.random(e).astype(np.float32)
    w = jnp.asarray(w_np)
    if args.bsr:
        import jax.numpy as _jnp
        ei = EdgeIndex(coo_np, (n, n)).fill_cache(
            dense_weight=w_np, block_sparse=True,
            cache_dtype=_jnp.bfloat16 if args.bf16 else None)
        from pytorch_geometric_tpu.ops.bsr_spmm import BS
        nb = int(ei.bsr.vals.shape[0])
        n_res = (int(ei.bsr_res[0].shape[0])
                 if ei.bsr_res is not None else 0)
        print(json.dumps({'bsr_blocks': nb, 'residual_edges': n_res,
                          'block_mb': round(nb * BS * BS * 4 / 1e6, 1),
                          'captured_frac': round(1 - n_res / e, 4)}))
    elif args.dense or args.int8:
        import jax.numpy as _jnp
        ei = EdgeIndex(coo_np, (n, n)).fill_cache(
            dense_weight=w_np,
            cache_dtype=(_jnp.int8 if args.int8 else
                         _jnp.bfloat16 if args.bf16 else None))
    elif args.windowed:
        ei = EdgeIndex(coo_np, (n, n)).fill_cache(windowed=True)
        assert ei.win is not None
    else:
        ei = EdgeIndex(coo_np, (n, n)).fill_cache()

    # Pass the EdgeIndex pytree as a jit ARGUMENT: closing over it would
    # bake the cached [N,N] adjacency into the HLO as a constant (slow
    # compiles; oversized remote-compile requests through the tunnel).
    if args.int8 or args.infer:
        @jax.jit
        def fwd_bwd(ei, x, w):
            return spmm(ei, x)
    elif args.bsr or args.dense:
        @jax.jit
        def fwd_bwd(ei, x, w):
            def loss(x):
                return (spmm(ei, x) ** 2).sum()
            l, gx = jax.value_and_grad(loss)(x)
            return l, gx
    else:
        @jax.jit
        def fwd_bwd(ei, x, w):
            def loss(x, w):
                return (spmm(ei, x, w) ** 2).sum()
            l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            return l, gx, gw

    def _force(o):
        # device-reduced scalar pull; block_until_ready can return
        # early on the remote tunnel backend (r4 debugging)
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(jnp.sum(leaf))

    out = fwd_bwd(ei, x, w)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = fwd_bwd(ei, x, w)
    _force(out)
    dt = (time.perf_counter() - t0) / args.steps

    gb = roofline_bytes(
        e, n, f, fwd_and_bwd=not (args.int8 or args.infer)) / 1e9
    gbps = gb / dt
    peak = HBM_GBPS.get(args.gen, 819.0)
    # algorithm-traffic roofline for the block/dense paths: what the
    # chosen algorithm actually streams (blocks/adjacency + x tiles +
    # out), vs `roofline_frac` below which uses the task's gather-model
    # lower bound and is comparable across paths (VERDICT r3 weak #3:
    # the BSR record previously reported edges/s only)
    alg = None
    if args.bsr:
        ib = ei.bsr.vals.dtype.itemsize
        from pytorch_geometric_tpu.ops.bsr_spmm import BS as _BS
        nb_f = int(ei.bsr.vals.shape[0])
        nb_b = int(ei.bsr_t.vals.shape[0])
        e_res = (int(ei.bsr_res[0].shape[0])
                 if ei.bsr_res is not None else 0)
        fwd_b = nb_f * _BS * _BS * ib + nb_f * _BS * f * 4 + n * f * 4 \
            + 3 * e_res * f * 4
        bwd_b = nb_b * _BS * _BS * ib + nb_b * _BS * f * 4 + n * f * 4 \
            + 3 * e_res * f * 4
        alg = fwd_b + (0 if (args.int8 or args.infer) else bwd_b)
    elif args.dense or args.int8:
        ib = ei.dense_adj.dtype.itemsize
        pass_b = n * n * ib + 2 * n * f * 4
        alg = pass_b * (1 if (args.int8 or args.infer) else 2)
    out_rec_alg = ({} if alg is None else {
        'algorithm_gbps': round(alg / 1e9 / dt, 1),
        'algorithm_roofline_frac': round(alg / 1e9 / dt / peak, 3)})
    print(json.dumps({
        'metric': 'spmm_fwd_bwd',
        'nodes': n, 'edges': e, 'features': f,
        'seconds_per_step': round(dt, 6),
        'edges_per_s': round(e / dt),
        'effective_gbps': round(gbps, 1),
        'roofline_frac': round(gbps / peak, 3),
        **out_rec_alg,
        'backend': jax.default_backend(),
        'path': ('windowed' if args.windowed else
                 'dense_int8_infer' if args.int8 else
                 'bsr_bf16' if (args.bsr and args.bf16) else
                 'bsr' if args.bsr else
                 'dense_bf16' if (args.dense and args.bf16) else
                 'dense' if args.dense else
                 'xla' if args.xla else 'auto'),
        'fwd_only': bool(args.int8 or args.infer),
        'clustered': args.clustered,
        'powerlaw': bool(args.powerlaw),
    }))


if __name__ == '__main__':
    main()
