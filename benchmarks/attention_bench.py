"""Fused attention-aggregation A/B — GAT softmax path.

Same-window comparison of the fused blocked kernel
(``ops/gat_fused.py::gat_aggregate`` — one MXU pass for the softmax
numerator + denominator, LSE-stabilised) against the XLA 3-pass path
(segment-max, exp/segment-sum, normalize + weighted segment-sum) on a
synthetic GAT workload. fwd+bwd per step.

Usage: python benchmarks/attention_bench.py [--nodes 100000
       --edges 2000000 --heads 4 --features 64] [--xla]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nodes', type=int, default=100_000)
    ap.add_argument('--edges', type=int, default=2_000_000)
    ap.add_argument('--heads', type=int, default=4)
    ap.add_argument('--features', type=int, default=64)
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--xla', action='store_true',
                    help='run the 3-pass XLA softmax baseline instead')
    ap.add_argument('--qkv', action='store_true',
                    help='q.k-scored per-edge-value attention '
                         '(TransformerConv/HGT form) through the '
                         'wide-gather alpha-only-VJP op; with --xla, '
                         'the equivalent raw gather/softmax/scatter')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pytorch_geometric_tpu import EdgeIndex
    from pytorch_geometric_tpu.ops.gat_fused import gat_aggregate
    from pytorch_geometric_tpu.ops.softmax import _softmax_xla

    n, e, h, f = args.nodes, args.edges, args.heads, args.features
    rng = np.random.default_rng(0)
    coo = rng.integers(0, n, (2, e)).astype(np.int32)
    # blocked cache only for the fused arm; the EdgeIndex is a jit
    # ARGUMENT (closure capture would bake the cache into HLO constants
    # — oversized remote-compile requests, see bench.py)
    ei = (EdgeIndex(coo, (n, n)).fill_cache(blocked=True)
          if not (args.xla or args.qkv) else None)
    logits = jnp.asarray(rng.standard_normal((e, h)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    dst = jnp.asarray(coo[1])
    src = jnp.asarray(coo[0])

    if args.qkv:
        from pytorch_geometric_tpu.ops.edge_attention import \
            hetero_edge_attention
        k = jnp.asarray(rng.standard_normal((n, h * f)).astype(
            np.float32) / np.sqrt(f))
        q3 = jnp.asarray(rng.standard_normal((n, h, f)).astype(
            np.float32))
        vflat = v.reshape(n, h * f)
        p1 = jnp.full((1, h), 1.0 / np.sqrt(f))
        rel = jnp.zeros((e,), jnp.int32)

        if args.xla:
            @jax.jit
            def fwd_bwd(ei, logits, v, dst, src):
                def loss(k, q3, v):
                    kk = k.reshape(n, h, f)
                    logit = ((q3[dst] * kk[src]).sum(-1)
                             / np.sqrt(f))
                    alpha = _softmax_xla(logit, dst, n)
                    msg = v[src] * alpha[:, :, None]
                    out = jax.ops.segment_sum(msg, dst, n)
                    return (out ** 2).sum()
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    k, q3, v)
                return l, g
        else:
            @jax.jit
            def _fwd_bwd_q(k, q3, vflat, p1, rel, dst, src):
                def loss(k, q3, vflat):
                    kv = jnp.concatenate([k, vflat], axis=1)
                    out = hetero_edge_attention(kv, q3, p1, rel, src,
                                                dst, n)
                    return (out ** 2).sum()
                l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                    k, q3, vflat)
                return l, g

            def fwd_bwd(ei, logits, v, dst, src):
                # all data as ARGUMENTS: closure capture serializes
                # into the remote-compile request (HTTP 413)
                return _fwd_bwd_q(k, q3, vflat, p1, rel, dst, src)
    elif args.xla:
        @jax.jit
        def fwd_bwd(ei, logits, v, dst, src):
            def loss(logits, v):
                alpha = _softmax_xla(logits, dst, n)        # 3 passes
                msg = v[src] * alpha[:, :, None]
                out = jax.ops.segment_sum(msg, dst, n)
                return (out ** 2).sum()
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(logits, v)
            return l, g
    else:
        @jax.jit
        def fwd_bwd(ei, logits, v, dst, src):
            def loss(logits, v):
                out = gat_aggregate(ei, logits, v)
                return (out ** 2).sum()
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(logits, v)
            return l, g

    import jax.numpy as _jnp

    def _force(o):
        # device-reduced scalar pull: block_until_ready returns early
        # on the remote tunnel backend (r4 debugging)
        leaf = jax.tree_util.tree_leaves(o)[0]
        return float(_jnp.sum(leaf))

    out = fwd_bwd(ei, logits, v, dst, src)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = fwd_bwd(ei, logits, v, dst, src)
    _force(out)
    dt = (time.perf_counter() - t0) / args.steps
    metric = ('qkv_edge_attention_fwd_bwd' if args.qkv
              else 'gat_softmax_aggregate_fwd_bwd')
    path = ('xla' if args.xla else
            ('wide-alpha-vjp' if args.qkv else 'fused'))
    print(json.dumps({
        'metric': metric,
        'nodes': n, 'edges': e, 'heads': h, 'features': f,
        'seconds_per_step': round(dt, 6),
        'edges_per_s': round(e / dt),
        'path': path,
        'backend': jax.default_backend(),
    }))


if __name__ == '__main__':
    main()
