"""End-to-end full-graph inference benchmark (serving path).

The model analog of the reference's ``benchmark/inference`` harness
(``benchmark/inference/README.md``: full-graph forward, L=3, H=128):
a 3-layer GCN forward over a synthetic graph, comparing the cached-
adjacency precision ladder — f32 / bf16 (storage, f32 accumulate) /
int8 (two-sided diag(r) Q diag(c) factorization, int32 accumulate).

Usage:  python benchmarks/inference_bench.py [--nodes 30000]
        [--edges 1000000] [--hidden 128] [--iters 20]

The default 30k nodes is the largest dense-[N,N] sweep that fits a
16 GB chip across all three dtypes (f32 3.6 GB / bf16 1.8 / int8 0.9).

Prints one JSON line per arm: seconds/forward, edges/s, speedup vs f32.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np


def gcn_norm_np(coo, n):
    """Self-loop append + the library's host-side norm weights
    (``parallel/models.py:gcn_norm_weights``) — coo+weights form so the
    sparse baseline arm and the dense arms share one normalisation."""
    from pytorch_geometric_tpu.parallel.models import gcn_norm_weights
    loops = np.arange(n, dtype=coo.dtype)
    coo_l = np.stack([np.concatenate([coo[0], loops]),
                      np.concatenate([coo[1], loops])])
    return coo_l, gcn_norm_weights(coo_l, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nodes', type=int, default=30_000)
    ap.add_argument('--edges', type=int, default=1_000_000)
    ap.add_argument('--hidden', type=int, default=128)
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    import os
    from pytorch_geometric_tpu import EdgeIndex
    from pytorch_geometric_tpu.nn.models import GCN

    n, e, h = args.nodes, args.edges, args.hidden
    # the dense-adjacency cache defaults to a 2.5e8-entry cap; this bench
    # explicitly sweeps the dense precision ladder, so lift it
    os.environ['PGT_DENSE_SPMM_ENTRIES'] = str(n * n + 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    coo = rng.integers(0, n, (2, e)).astype(np.int32)
    coo_n, w_np = gcn_norm_np(coo, n)

    model = GCN(hidden_channels=h, num_layers=3, out_channels=16,
                conv_kwargs={'normalize': False,
                             'add_self_loops': False})

    results = {}
    base = None
    for name, dt in (('sparse-f32', 'sparse'), ('f32', None),
                     ('bf16', jnp.bfloat16), ('int8', jnp.int8)):
        if dt == 'sparse':
            ei = EdgeIndex(coo_n, (n, n)).fill_cache()
            kw = {'edge_weight': jnp.asarray(w_np)}
        else:
            ei = EdgeIndex(coo_n, (n, n)).fill_cache(dense_weight=w_np,
                                                     cache_dtype=dt)
            kw = {}
            assert ei.dense_adj is not None, name

        params = model.init(jax.random.PRNGKey(0), x, ei, **kw)

        @jax.jit
        def fwd(params, x, ei):
            return model.apply(params, x, ei, **kw)

        out = fwd(params, x, ei)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, x, ei)
        jax.block_until_ready(out)
        dt_s = (time.perf_counter() - t0) / args.iters
        base = base or dt_s
        results[name] = dt_s
        print(json.dumps({
            'metric': 'gcn_inference_fwd', 'arm': name,
            'value': round(dt_s, 5), 'unit': 's',
            'edges_per_s': round(3 * e / dt_s),
            'speedup_vs_sparse': round(base / dt_s, 3),
            'backend': jax.default_backend(),
            'nodes': n, 'edges': e, 'hidden': h,
        }))
        # argmax agreement vs the sparse-f32 arm (serving-quality check)
        if name == 'sparse-f32':
            ref_pred = np.asarray(out).argmax(-1)
        else:
            agree = float((np.asarray(out).argmax(-1) == ref_pred).mean())
            print(json.dumps({'metric': 'argmax_agreement', 'arm': name,
                              'value': round(agree, 4)}))


if __name__ == '__main__':
    main()
