"""End-to-end sampled-training benchmark (reference training harness).

Protocol from the reference's training benchmark
(``benchmark/training/README.md:24-47``, cited in BASELINE.md): 2-layer
GraphSAGE, hidden 64, batch 512, neighbor fanouts [15, 10], 50
optimiser steps — but measured END TO END: C++ neighbor sampling +
feature collation on the host, padded static-shape batches, one
compiled train step on the device, host/device overlap via
PrefetchLoader's producer threads.

The graph defaults to Reddit scale (233k nodes / 115M directed edges /
602 features, synthetic — zero-egress environment); --small runs a
500k/10M/128 graph that fits modest host RAM.

Prints one JSON line: batches/s, sampled-edges/s, and the split between
host sampling and device compute.

Defaults are the DOCUMENTED production path: device-resident
features gathered by n_id inside jit (--device-gather) and 8 optimiser
steps per dispatch (--scan 8, lax.scan over stacked batches — parity
with per-step dispatch asserted in tests/test_scan_train.py; all
stacked batches share the loader's fixed padded shapes, so the scan
compiles once). Opt out with --no-device-gather / --scan 0.

Usage:
    python benchmarks/sampled_train_bench.py [--small] [--steps 50]
        [--workers 4] [--batch-size 512] [--scan K] [--no-device-gather]
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
    ap.add_argument('--small', action='store_true')
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--batch-size', type=int, default=512)
    ap.add_argument('--workers', type=int, default=4)
    ap.add_argument('--fanouts', default='15,10')
    ap.add_argument('--hidden', type=int, default=64)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--device-gather', action=argparse.BooleanOptionalAction,
                    default=True,
                    help='TPU-native layout: features/labels resident '
                         'on device, structure-only batches, rows '
                         'gathered by n_id inside the jitted step '
                         '(loader filter_features=False). Only indices '
                         'cross the host->device link per batch.')
    ap.add_argument('--scan', type=int, default=8, metavar='K',
                    help='stack K sampled batches and run K optimiser '
                         'steps in ONE device call (lax.scan over the '
                         'batch axis) — amortises per-dispatch latency, '
                         'the dominant cost on a tunneled/remote chip. '
                         'Requires --device-gather.')
    args = ap.parse_args()
    if args.scan and not args.device_gather:
        args.scan = 0          # scan rides the device-gather layout

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax
    from pytorch_geometric_tpu.data import Data
    from pytorch_geometric_tpu.loader import NeighborLoader, PrefetchLoader
    from pytorch_geometric_tpu.nn.models import GraphSAGE

    if args.small:
        N, E, F, C = 500_000, 10_000_000, 128, 16
    else:
        N, E, F, C = 232_965, 114_615_892, 602, 41  # Reddit shape
    rng = np.random.default_rng(0)
    coo = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)])
    data = Data(x=rng.standard_normal((N, F)).astype(np.float32),
                edge_index=coo.astype(np.int32),
                y=rng.integers(0, C, N).astype(np.int32), num_nodes=N)
    fanouts = [int(f) for f in args.fanouts.split(',')]

    t_build = time.perf_counter()
    # num_workers parallelises the C++ sampler across batches (it
    # releases the GIL); the PrefetchLoader thread then only device-puts
    loader = NeighborLoader(data, num_neighbors=fanouts,
                            batch_size=args.batch_size, shuffle=True,
                            num_workers=args.workers,
                            filter_features=not args.device_gather)
    t_build = time.perf_counter() - t_build

    model = GraphSAGE(hidden_channels=args.hidden, num_layers=len(fanouts),
                      out_channels=C)
    b0 = next(iter(loader))
    n_cap = int(b0.num_nodes)
    tx = optax.adam(1e-3)

    if args.device_gather:
        # one-time residency; X/Y are jit ARGUMENTS (closure capture
        # would serialize 256MB+ into the remote-compile request)
        X = jax.device_put(np.asarray(data.x))
        Y = jax.device_put(np.asarray(data.y).astype(np.int32))
        jax.block_until_ready(Y)
        params = model.init(jax.random.PRNGKey(0), X[:n_cap],
                            np.asarray(b0.edge_index))
        opt = tx.init(params)

        @jax.jit
        def dstep(params, opt, X, Y, n_id, node_mask, coo, emask,
                  batch_size):
            seed_mask = jnp.arange(n_cap) < batch_size
            safe = jnp.where(node_mask, n_id, 0)
            x = jnp.where(node_mask[:, None], X[safe], 0)
            y = Y[safe]

            def loss_fn(p):
                logits = model.apply(p, x, coo, edge_mask=emask)
                l = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                return jnp.where(seed_mask, l, 0).sum() / seed_mask.sum()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        def device_step(params, opt, b):
            # batch fields are already device arrays (PrefetchLoader
            # device_puts them on the producer thread); touching them
            # with np.asarray / int() would cost a D2H round trip per
            # field per batch
            coo_b = (b.edge_index.coo if hasattr(b.edge_index, 'coo')
                     else b.edge_index)
            return dstep(params, opt, X, Y, b.n_id, b.node_mask,
                         coo_b, b.edge_mask, b.batch_size)

        @jax.jit
        def dscan(params, opt, X, Y, n_ids, node_masks, coos, emasks,
                  seed_masks):
            def body(carry, b):
                params, opt = carry
                n_id, node_mask, coo, emask, seed_mask = b
                safe = jnp.where(node_mask, n_id, 0)
                x = jnp.where(node_mask[:, None], X[safe], 0)
                y = Y[safe]

                def loss_fn(p):
                    logits = model.apply(p, x, coo, edge_mask=emask)
                    l = optax.softmax_cross_entropy_with_integer_labels(
                        logits, y)
                    return jnp.where(seed_mask, l, 0).sum() \
                        / seed_mask.sum()
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt = tx.update(grads, opt)
                return (optax.apply_updates(params, updates), opt), loss
            (params, opt), losses = jax.lax.scan(
                body, (params, opt),
                (n_ids, node_masks, coos, emasks, seed_masks))
            return params, opt, losses[-1]

        def device_scan_steps(params, opt, batches):
            def stk(key):
                return jnp.asarray(np.stack(
                    [np.asarray(getattr(b, key)) for b in batches]))
            seed = np.stack([np.arange(n_cap) < int(b.batch_size)
                             for b in batches])
            return dscan(params, opt, X, Y, stk('n_id'),
                         stk('node_mask'), stk('edge_index'),
                         stk('edge_mask'), jnp.asarray(seed))
    else:
        params = model.init(jax.random.PRNGKey(0), b0.x,
                            np.asarray(b0.edge_index))
        opt = tx.init(params)

        @jax.jit
        def hstep(params, opt, x, coo, emask, y, seed_mask):
            def loss_fn(p):
                logits = model.apply(p, x, coo, edge_mask=emask)
                l = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                return jnp.where(seed_mask, l, 0).sum() / seed_mask.sum()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        def device_step(params, opt, b):
            seed_mask = jnp.arange(b.x.shape[0]) < int(b.batch_size)
            return hstep(params, opt, jnp.asarray(np.asarray(b.x)),
                         jnp.asarray(np.asarray(b.edge_index)),
                         jnp.asarray(np.asarray(b.edge_mask)),
                         jnp.asarray(np.asarray(b.y)), seed_mask)

    def make_iter():
        # scan mode restacks K host batches before ONE upload, so the
        # producer must NOT device-put them (put=False)
        return iter(PrefetchLoader(loader, num_threads=args.workers,
                                   put=not args.scan)
                    if args.workers > 0 else loader)

    def run(n_steps):
        nonlocal params, opt
        it = make_iter()
        host_s = 0.0
        loss = None

        def nxt(it):
            try:
                return next(it), it
            except StopIteration:
                it.close()
                it = make_iter()
                return next(it), it

        try:
            if args.scan and args.device_gather:
                K = args.scan
                done = 0
                while done < n_steps:
                    t0 = time.perf_counter()
                    group = []
                    # always stack exactly K (repeat the last batch at
                    # the tail) so dscan compiles once
                    while len(group) < K:
                        if done + len(group) < n_steps:
                            b, it = nxt(it)
                        group.append(b)
                    host_s += time.perf_counter() - t0
                    params, opt, loss = device_scan_steps(params, opt,
                                                          group)
                    done += K
                jax.block_until_ready(loss)
                return host_s
            for i in range(n_steps):
                t0 = time.perf_counter()
                b, it = nxt(it)
                host_s += time.perf_counter() - t0
                params, opt, loss = device_step(params, opt, b)
        finally:
            # close the generator so the producer thread sees the stop
            # event and exits before interpreter teardown (an abandoned
            # thread dies mid-C++-sampler-call -> std::terminate)
            if hasattr(it, 'close'):
                it.close()
        jax.block_until_ready(loss)
        return host_s

    # warmup: compile + fill padding buckets
    run(3)
    eff_steps = args.steps
    if args.scan and args.device_gather:
        import math
        eff_steps = math.ceil(args.steps / args.scan) * args.scan
    t0 = time.perf_counter()
    host_wait_s = run(args.steps)
    total = time.perf_counter() - t0

    # sampled edges per batch (static padded shape => constant)
    e_pad = int(np.asarray(b0.edge_index).shape[1])
    e_real = int(np.asarray(b0.edge_mask).sum())
    print(json.dumps({
        'metric': 'sage_sampled_train',
        'graph': f'{N}n/{E}e/F{F}',
        'batch_size': args.batch_size,
        'fanouts': fanouts,
        'steps': eff_steps,
        'value': round(total, 3),
        'unit': 's',
        'batches_per_s': round(eff_steps / total, 2),
        'sampled_edges_per_s': round(eff_steps * e_real / total),
        'host_wait_frac': round(host_wait_s / total, 3),
        'edge_pad_frac': round(1 - e_real / e_pad, 3),
        'loader_build_s': round(t_build, 1),
        'workers': args.workers,
        'device_gather': bool(args.device_gather),
        'scan': args.scan,
        'h2d_mb_per_batch': round(
            (n_cap * (4 + 1) + e_pad * 12) / 1e6 if args.device_gather
            else (n_cap * (F + 1) * 4 + e_pad * 12) / 1e6, 2),
        'backend': jax.default_backend(),
    }))


if __name__ == '__main__':
    main()
