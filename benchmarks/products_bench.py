"""ogbn-products-scale protocol benchmark (VERDICT r3 #1).

Synthetic graph with the ogbn-products shape — 2,449,029 nodes /
123,718,280 directed edges (the real dataset needs a download; this
environment has zero egress) — heavy-tailed degrees + community
structure + scrambled ids, i.e. the regime where the dense [N, N]
cache is excluded by memory and the automatic policy must fall through.

Two arms, mirroring the reference training/inference harnesses
(``/root/reference/benchmark/training/README.md:24-47``,
``benchmark/inference/README.md``):

  --train   sampled GraphSAGE training: batch 512, fanouts [15, 10],
            hidden 64, 50 optimiser steps, END TO END (C++ neighbor
            sampler on the host, padded static batches, device-resident
            features gathered by n_id inside the jitted step, K steps
            per dispatch via lax.scan — the documented default path).
  --infer   full-graph 2-layer inference on one chip. At this scale the
            policy picks the edge-chunked SpMM (gathered [E, F] bytes
            >> HBM); reports edges/s, effective GB/s, and % of the HBM
            roofline for BOTH the algorithm's real traffic (gather
            re-reads) and the information-theoretic floor (each x row
            read once) so the gather tax is explicit.

Prints one JSON line per arm.
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_PRODUCTS = 2_449_029
E_PRODUCTS = 123_718_280
F, C = 100, 47
HBM_GBPS = 819.0   # v5e


def build_products_like(n=N_PRODUCTS, e=E_PRODUCTS, seed=0,
                        scale=1.0):
    """Products-like synthetic: ~60% of edges intra-community
    (communities of ~2.4k nodes), the rest endpoint-skewed toward hub
    nodes (power-law); node ids scrambled so no natural block structure
    survives (the real dataset's ids are unordered too)."""
    if scale != 1.0:
        n, e = int(n * scale), int(e * scale)
    rng = np.random.default_rng(seed)
    csize = 2400
    n_comm = max(n // csize, 1)
    src = rng.integers(0, n, e, dtype=np.int64)
    intra = rng.random(e) < 0.6
    comm = np.minimum(src // csize, n_comm - 1)
    dst_intra = comm * csize + rng.integers(0, csize, e)
    # hub-skewed global endpoints: id ~ n * u^3 concentrates on low ids
    dst_hub = (n * rng.random(e) ** 3).astype(np.int64)
    dst = np.minimum(np.where(intra, dst_intra, dst_hub), n - 1)
    # scramble ids with a fixed permutation
    perm = rng.permutation(n)
    coo = np.stack([perm[src], perm[dst]]).astype(np.int32)
    return coo, n, e


def run_infer(coo, n, e, hidden, bf16=False):
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_tpu import EdgeIndex
    from pytorch_geometric_tpu.ops import spmm, spmm_regime

    rng = np.random.default_rng(1)
    dt_np = np.float32
    x_np = rng.standard_normal((n, F)).astype(dt_np)
    if bf16:
        # inference fast path: the chunked SpMM is gather-bound on the
        # x-row stream; bf16 rows halve it (weights/accumulation decide
        # numerics elsewhere)
        import jax.numpy as _jnp
        x_np = x_np.astype(_jnp.bfloat16)

    t0 = time.perf_counter()
    ei = EdgeIndex(coo, (n, n)).fill_cache(auto=True)
    build_s = time.perf_counter() - t0
    regime = spmm_regime(ei, num_feats=hidden)

    # 2-layer SAGE-style inference: per layer one SpMM(mean) + two GEMMs
    import flax.linen as fnn

    class Layer(fnn.Module):
        feats: int

        @fnn.compact
        def __call__(self, x, ei):
            agg = spmm(ei, x, reduce='mean')
            return (fnn.Dense(self.feats, name='l')(agg)
                    + fnn.Dense(self.feats, name='r')(x))

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, x, ei):
            x = fnn.relu(Layer(hidden)(x, ei))
            return Layer(C)(x, ei)

    net = Net()
    X = jax.device_put(x_np)
    del x_np
    params = jax.jit(net.init)(jax.random.PRNGKey(0), X, ei)

    # reduce on device, pull ONE scalar: a D2H transfer genuinely forces
    # completion on the remote tunnel backend (block_until_ready on the
    # full [N, C] output returned instantly there — r4 debugging)
    fwd = jax.jit(lambda p, x, ei: net.apply(p, x, ei).sum())
    chk = float(fwd(params, X, ei))     # compile + warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        chk = float(fwd(params, X, ei))
    dt = (time.perf_counter() - t0) / reps

    # traffic accounting, per SpMM pass (2 passes: F->H then H->C uses
    # hidden-width aggregation; count each at its feature width):
    widths = [F, hidden]
    # chunked path real traffic: per edge one x-row gather (w*4 bytes,
    # random => counted at face value) + 12 B indices/weight; plus the
    # [N, w] accumulator stream per chunk pass
    it = 2 if bf16 else 4
    real_bytes = sum(e * (w * it + 12) + 2 * n * w * it
                     for w in widths)
    # information floor: every x row read once, out written once, edge
    # list read once
    floor_bytes = sum(2 * n * w * 4 + e * 8 for w in widths)
    gbps = real_bytes / dt / 1e9
    return {
        'checksum': round(chk, 2),
        'metric': 'products_fullgraph_inference'
                  + ('_bf16' if bf16 else ''),
        'graph': f'{n}n/{e}e/F{F}/H{hidden}',
        'regime': regime,
        'build_s': round(build_s, 2),
        'value': round(dt, 3),
        'unit': 's/forward',
        'edges_per_s': round(2 * e / dt),
        'algorithm_gbps': round(gbps, 1),
        'pct_roofline_algorithm': round(100 * gbps / HBM_GBPS, 1),
        'pct_roofline_floor': round(
            100 * (floor_bytes / dt / 1e9) / HBM_GBPS, 1),
        'backend': __import__('jax').default_backend(),
    }


def run_train(coo, n, e, steps, scan_k, workers, overlap=False):
    """Protocol sampled training — delegates to sampled_train_bench's
    loop via subprocess-free reuse: same loader/model wiring, products
    graph."""
    import jax
    import jax.numpy as jnp
    import optax
    from pytorch_geometric_tpu.data import Data
    from pytorch_geometric_tpu.loader import (NeighborLoader,
                                              PrefetchLoader)
    from pytorch_geometric_tpu.nn.models import GraphSAGE

    rng = np.random.default_rng(1)
    data = Data(x=rng.standard_normal((n, F)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, C, n).astype(np.int32),
                num_nodes=n)
    fanouts = [15, 10]
    batch_size = 512
    t0 = time.perf_counter()
    loader = NeighborLoader(data, num_neighbors=fanouts,
                            batch_size=batch_size, shuffle=True,
                            num_workers=workers, filter_features=False)
    build_s = time.perf_counter() - t0

    model = GraphSAGE(hidden_channels=64, num_layers=2, out_channels=C)
    b0 = next(iter(loader))
    n_cap = int(b0.num_nodes)
    tx = optax.adam(1e-3)
    X = jax.device_put(np.asarray(data.x))
    Y = jax.device_put(np.asarray(data.y).astype(np.int32))
    jax.block_until_ready(Y)
    params = model.init(jax.random.PRNGKey(0), X[:n_cap],
                        np.asarray(b0.edge_index))
    opt = tx.init(params)
    # the library scan-K pair (loader/scan_train.py): K steps per
    # dispatch, int16 wire format for the batch-local edge ids
    from pytorch_geometric_tpu.loader import (make_device_train_step,
                                              stack_batches)
    _, dscan_lib = make_device_train_step(model, tx)

    def scan_group(params, opt, batches):
        stacked = stack_batches(batches)
        return dscan_lib(params, opt, X, Y, stacked)

    def run(n_steps):
        nonlocal params, opt
        it = iter(PrefetchLoader(loader, num_threads=workers, put=False)
                  if workers > 0 else loader)
        host_s, loss, done = 0.0, None, 0
        try:
            while done < n_steps:
                t0 = time.perf_counter()
                group = []
                while len(group) < scan_k:
                    try:
                        group.append(next(it))
                    except StopIteration:
                        if hasattr(it, 'close'):
                            it.close()
                        it = iter(PrefetchLoader(
                            loader, num_threads=workers, put=False)
                            if workers > 0 else loader)
                host_s += time.perf_counter() - t0
                params, opt, loss = scan_group(params, opt, group)
                done += scan_k
        finally:
            if hasattr(it, 'close'):
                it.close()
        jax.block_until_ready(loss)
        return host_s

    # --- overlap arm (VERDICT r4 #9): a background thread stacks +
    # device_puts group k+1 while group k's scan executes, so the
    # tunnel H2D/dispatch latency that dominates the synchronous loop
    # amortizes under device compute. Double-buffered (queue depth 2).
    def run_overlap(n_steps):
        nonlocal params, opt
        import queue
        import threading
        dq: 'queue.Queue' = queue.Queue(maxsize=2)
        stop = object()
        err = []

        def uploader():
            it = None
            try:
                it = iter(PrefetchLoader(loader, num_threads=workers,
                                         put=False)
                          if workers > 0 else loader)
                done_up = 0
                while done_up < n_steps:
                    group = []
                    while len(group) < scan_k:
                        try:
                            group.append(next(it))
                        except StopIteration:
                            if hasattr(it, 'close'):
                                it.close()
                            it = iter(PrefetchLoader(
                                loader, num_threads=workers, put=False)
                                if workers > 0 else loader)
                    stacked = stack_batches(group)
                    dev = {k: jax.device_put(np.asarray(v))
                           for k, v in stacked.items()}
                    jax.block_until_ready(list(dev.values()))
                    dq.put(dev)
                    done_up += scan_k
            except Exception as exc:          # surface in main thread
                err.append(exc)
            finally:
                if hasattr(it, 'close'):
                    it.close()
                dq.put(stop)

        th = threading.Thread(target=uploader, daemon=True)
        th.start()
        loss = None
        while True:
            dev = dq.get()
            if dev is stop:
                break
            params, opt, loss = dscan_lib(params, opt, X, Y, dev)
        th.join()
        if err:
            raise err[0]
        jax.block_until_ready(loss)

    run(scan_k)         # compile + bucket warmup
    import math
    eff = math.ceil(steps / scan_k) * scan_k
    if overlap:
        t0 = time.perf_counter()
        run_overlap(eff)
        total = time.perf_counter() - t0
        host_s = 0.0
    else:
        t0 = time.perf_counter()
        host_s = run(eff)
        total = time.perf_counter() - t0

    # --- wall decomposition: device compute vs H2D vs dispatch -------
    # (a) device-only: ONE pre-uploaded group re-run M times — no
    # sampling, no upload; (b) H2D-only: device_put of a fresh host
    # group. Whatever the end-to-end number misses beyond (a)+(b)+host
    # sampling is the tunnel's per-dispatch latency.
    it = iter(loader)
    group = [next(it) for _ in range(scan_k)]
    if hasattr(it, 'close'):
        it.close()
    stacked_host = {k: np.asarray(v)
                    for k, v in stack_batches(group).items()}
    stacked_dev = {k: jax.device_put(v)
                   for k, v in stacked_host.items()}
    p2, o2, l2 = dscan_lib(params, opt, X, Y, stacked_dev)
    float(jnp.sum(l2))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _, _, l2 = dscan_lib(params, opt, X, Y, stacked_dev)
    float(jnp.sum(l2))
    dev_s_per_group = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        up = {k: jax.device_put(v) for k, v in stacked_host.items()}
        jax.block_until_ready(list(up.values()))
    h2d_s_per_group = (time.perf_counter() - t0) / reps
    group_mb = sum(v.nbytes for v in stacked_host.values()) / 1e6

    e_pad = int(np.asarray(b0.edge_index).shape[1])
    e_real = int(np.asarray(b0.edge_mask).sum())
    return {
        'device_only_batches_per_s': round(
            scan_k / dev_s_per_group, 1),
        'h2d_s_per_group': round(h2d_s_per_group, 3),
        'group_upload_mb': round(group_mb, 1),
        'device_s_per_group': round(dev_s_per_group, 3),
        'metric': ('products_sampled_train_overlap' if overlap
                   else 'products_sampled_train'),
        'graph': f'{n}n/{e}e/F{F}',
        'protocol': 'sage b512 fanouts[15,10] h64',
        'steps': eff,
        'scan_k': scan_k,
        'loader_build_s': round(build_s, 2),
        'value': round(total, 3),
        'unit': 's',
        'batches_per_s': round(eff / total, 1),
        'sampled_edges_per_s': round(eff * e_real / total),
        'edge_pad_efficiency': round(e_real / e_pad, 3),
        'host_wait_frac': round(host_s / total, 3),
        'backend': __import__('jax').default_backend(),
    }


def run_gat(coo, n, e, hidden):
    """Full-graph GAT train step at products scale through the
    online-softmax flash scan (ops/edge_attention.py): every
    whole-edge-list attention formulation needs [E, H] logits (stored
    32x lane-padded) + [E, H, C] messages — hundreds of GB here. The
    reference has no configuration that runs full-graph GAT at this
    scale on any single device."""
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as fnn
    from pytorch_geometric_tpu.nn import GATConv

    rng = np.random.default_rng(2)
    x_np = rng.standard_normal((n, F)).astype(np.float32)
    y_np = rng.integers(0, C, n).astype(np.int32)

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, x, coo):
            x = fnn.relu(GATConv(out_channels=hidden // 4, heads=4)(
                x, coo))
            return GATConv(out_channels=C, heads=1,
                           concat=False)(x, coo)

    net = Net()
    X = jax.device_put(x_np)
    del x_np
    COO = jax.device_put(coo)
    Y = jax.device_put(jnp.asarray(y_np))
    params = jax.jit(net.init)(jax.random.PRNGKey(0), X, COO)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, X, COO, Y):
        def loss_fn(p):
            logits = net.apply(p, X, COO)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, Y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    def _force(o):
        import jax.numpy as _j
        return float(_j.sum(jax.tree_util.tree_leaves(o)[-1]))

    params, opt, loss = step(params, opt, X, COO, Y)   # compile
    _force(loss)
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt, loss = step(params, opt, X, COO, Y)
    _force(loss)
    dt = (time.perf_counter() - t0) / reps
    return {'metric': 'products_fullgraph_gat_train_step',
            'graph': f'{n}n/{e}e/F{F}/H4x{hidden // 4}',
            'value': round(dt, 3), 'unit': 's/step',
            'loss': round(float(loss), 4),
            'edges_per_s': round(2 * e / dt),
            'path': 'flash scan (online softmax)',
            'backend': jax.default_backend()}


def run_gat_md(coo, n, e, hidden, kblocks=8, reps=2, check=False,
               bwd_src_sorted=True):
    """Full-graph GAT train step at products scale as K DISPATCHES:
    the axon tunnel kills single executions past ~60-90 s, so the
    scale-1.0 (124M-edge) step could only be projected until now. The
    two flash scans (one per layer) and their backward scans run as
    ``kblocks`` chunk-block dispatches with the scan carries living on
    device between calls (ops/edge_attention.py block API,
    parity-pinned in tests/test_spmm_windowed.py); the dense
    projection / loss / optimizer stages are their own small
    dispatches. Identical math to :func:`run_gat`'s single-dispatch
    step (set ``check=True`` to assert the loss matches at small
    scale)."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as fnn
    from pytorch_geometric_tpu.nn import GATConv
    from pytorch_geometric_tpu.ops import edge_attention as ea

    H1, C1 = 4, hidden // 4
    rng = np.random.default_rng(2)
    x_np = rng.standard_normal((n, F)).astype(np.float32)
    y_np = rng.integers(0, C, n).astype(np.int32)

    # host prep (the fill_cache analogue): drop existing self loops,
    # append fresh ones (GATConv's add_self_loops semantics), dst-sort
    # ONCE, chunk. This also removes the per-step device argsort the
    # in-module path pays.
    keep = coo[0] != coo[1]
    loops = np.arange(n, dtype=coo.dtype)
    src = np.concatenate([coo[0][keep], loops])
    dst = np.concatenate([coo[1][keep], loops])
    order = np.argsort(dst, kind='stable')
    src, dst = src[order], dst[order]
    e_eff = len(src)
    chunk = int(float(os.environ.get('PGT_ATTN_CHUNK_EDGES', 2e6)))
    c = max(min(chunk, e_eff), 1)
    nc = -(-e_eff // c)
    # round the chunk count up to a multiple of kblocks
    nc = -(-nc // kblocks) * kblocks
    pad = nc * c - e_eff
    s_ch = np.pad(src, (0, pad)).reshape(nc, c)
    d_ch = np.pad(dst, (0, pad), constant_values=n).reshape(nc, c)
    kb = nc // kblocks
    S = [jax.device_put(s_ch[i * kb:(i + 1) * kb])
         for i in range(kblocks)]
    D = [jax.device_put(d_ch[i * kb:(i + 1) * kb])
         for i in range(kblocks)]
    del s_ch, d_ch
    # src-sorted copy for the backward blocks: dsrc/dv scatters take
    # the sorted lowering (invalid pads carry s == n and drop)
    SB = DB = None
    if bwd_src_sorted:
        order_b = np.argsort(src, kind='stable')
        sb = np.pad(src[order_b], (0, pad), constant_values=n)
        db = np.pad(dst[order_b], (0, pad), constant_values=n)
        sb, db = sb.reshape(nc, c), db.reshape(nc, c)
        SB = [jax.device_put(sb[i * kb:(i + 1) * kb])
              for i in range(kblocks)]
        DB = [jax.device_put(db[i * kb:(i + 1) * kb])
              for i in range(kblocks)]
        del sb, db

    # params from the SAME flax net run_gat uses (exact parity)
    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, x, coo):
            x = fnn.relu(GATConv(out_channels=C1, heads=H1)(x, coo))
            return GATConv(out_channels=C, heads=1,
                           concat=False)(x, coo)

    net = Net()
    coo_tiny = np.stack([src[:64], dst[:64]]).astype(np.int32)
    p0 = jax.jit(net.init)(jax.random.PRNGKey(0),
                           jnp.zeros((n, F), jnp.float32), coo_tiny)
    g0, g1 = p0['params']['GATConv_0'], p0['params']['GATConv_1']
    params = {
        'w1': g0['lin_src']['kernel'], 'as1': g0['att_src'],
        'ad1': g0['att_dst'], 'b1': g0['bias'],
        'w2': g1['lin_src']['kernel'], 'as2': g1['att_src'],
        'ad2': g1['att_dst'], 'b2': g1['bias'],
    }
    X = jax.device_put(x_np)
    del x_np
    Y = jax.device_put(jnp.asarray(y_np))
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    slope = 0.2

    @jax.jit
    def proj(x, w, att_s, att_d):
        h = att_s.shape[1]
        xp = (x @ w).reshape(n, h, -1)
        return (xp.reshape(n, -1), (xp * att_s).sum(-1),
                (xp * att_d).sum(-1))

    f_blk1 = jax.jit(functools.partial(ea.gat_flash_fwd_block, n,
                                       slope))
    f_blk2 = jax.jit(functools.partial(ea.gat_flash_fwd_block, n,
                                       slope))
    b_blk1 = jax.jit(functools.partial(
        ea.gat_flash_bwd_block, n, slope,
        src_sorted=bwd_src_sorted))
    b_blk2 = jax.jit(functools.partial(
        ea.gat_flash_bwd_block, n, slope,
        src_sorted=bwd_src_sorted))

    # jitted once up-front: fresh jit objects inside the timed loop
    # would retrace+recompile every rep (review finding)
    f_fin1 = jax.jit(functools.partial(ea.gat_flash_fwd_finish, n,
                                       H1, C1))
    f_fin2 = jax.jit(functools.partial(ea.gat_flash_fwd_finish, n,
                                       1, C))
    b_fin1 = jax.jit(functools.partial(ea.gat_flash_bwd_finish, n, H1))
    b_fin2 = jax.jit(functools.partial(ea.gat_flash_bwd_finish, n, 1))
    relu_bwd = jax.jit(lambda dh, hh: jnp.where(hh > 0, dh, 0.0))

    def flash_fwd(f_blk, f_fin, a_s, a_d, v, h, dh):
        carry = ea.gat_flash_fwd_start(n, h, dh)
        for i in range(kblocks):
            carry = f_blk(a_s, a_d, v, S[i], D[i], carry)
        return f_fin(carry)

    BS_, BD_ = (SB, DB) if bwd_src_sorted else (S, D)

    def flash_bwd(b_blk, b_fin, a_s, a_d, v, m, l, out, g, h):
        carry = ea.gat_flash_bwd_start(n, n, h, v.shape[1])
        for i in range(kblocks):
            carry = b_blk(a_s, a_d, v, m, l, out, g, BS_[i], BD_[i],
                          carry)
        return b_fin(carry)

    @jax.jit
    def layer1_post(acc_out, b1):
        return jnp.maximum(acc_out + b1, 0.0)          # concat + relu

    @jax.jit
    def loss_head(out2_flat, b2, y):
        logits = out2_flat + b2                        # heads=1 mean
        logz = jax.nn.log_softmax(logits)
        loss = -jnp.take_along_axis(logz, y[:, None], 1).mean()
        dlogits = (jnp.exp(logz)
                   - jax.nn.one_hot(y, C, dtype=logits.dtype)) / n
        return loss, dlogits

    @jax.jit
    def alpha_param_bwd(dsrc, ddst, dv, xp_flat, att_s, att_d, x_in,
                        w):
        h = att_s.shape[1]
        xp = xp_flat.reshape(n, h, -1)
        dxp = (dv.reshape(n, h, -1) + dsrc[:, :, None] * att_s
               + ddst[:, :, None] * att_d)
        datt_s = (dsrc[:, :, None] * xp).sum(0, keepdims=True)
        datt_d = (ddst[:, :, None] * xp).sum(0, keepdims=True)
        dw = x_in.T @ dxp.reshape(n, -1)
        dx_in = dxp.reshape(n, -1) @ w.T
        return dw, datt_s, datt_d, dx_in

    @jax.jit
    def adam_step(params, opt, grads):
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt

    def one_step(params, opt):
        # ---- forward
        v1, as1, ad1 = proj(X, params['w1'], params['as1'],
                            params['ad1'])
        m1, l1, o1 = flash_fwd(f_blk1, f_fin1, as1, ad1, v1, H1, C1)
        h1 = layer1_post(o1, params['b1'].reshape(1, -1))
        v2, as2, ad2 = proj(h1, params['w2'], params['as2'],
                            params['ad2'])
        m2, l2, o2 = flash_fwd(f_blk2, f_fin2, as2, ad2, v2, 1, C)
        loss, dlogits = loss_head(o2, params['b2'][None], Y)
        # ---- backward
        db2 = dlogits.sum(0)
        ds2, dd2, dv2 = flash_bwd(b_blk2, b_fin2, as2, ad2, v2, m2,
                                  l2, o2, dlogits, 1)
        dw2, das2, dad2, dh1 = alpha_param_bwd(
            ds2, dd2, dv2, v2, params['as2'], params['ad2'], h1,
            params['w2'])
        do1 = relu_bwd(dh1, h1)
        db1 = do1.sum(0)
        ds1, dd1, dv1 = flash_bwd(b_blk1, b_fin1, as1, ad1, v1, m1,
                                  l1, o1, do1, H1)
        dw1, das1, dad1, _ = alpha_param_bwd(
            ds1, dd1, dv1, v1, params['as1'], params['ad1'], X,
            params['w1'])
        grads = {'w1': dw1, 'as1': das1, 'ad1': dad1, 'b1': db1,
                 'w2': dw2, 'as2': das2, 'ad2': dad2, 'b2': db2}
        params, opt = adam_step(params, opt, grads)
        return params, opt, loss

    def _force(o):
        return float(jnp.sum(jax.tree_util.tree_leaves(o)[-1]))

    if check:
        # ONE autodiff step of the SAME net from the SAME init params
        # (comparing against run_gat's third-step loss would mix
        # training progress into the parity gate — review finding)
        COO = jax.device_put(np.stack([src, dst]).astype(np.int32))

        @jax.jit
        def ref_step(p0, y):
            def loss_fn(p):
                logits = net.apply(p, X, COO)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            return jax.value_and_grad(loss_fn)(p0)[0]

        # self-loops already appended host-side; disable re-adding
        os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
        try:
            ref_loss = float(ref_step(p0, Y))
        finally:
            del os.environ['PGT_ATTN_WIDE_BYTES']

    params, opt, loss = one_step(params, opt)      # compile
    _force(loss)
    if check:
        assert abs(ref_loss - float(loss)) < 1e-2, (ref_loss,
                                                    float(loss))
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt, loss = one_step(params, opt)
    _force(loss)
    dt = (time.perf_counter() - t0) / reps
    return {'metric': 'products_fullgraph_gat_train_step_md',
            'graph': f'{n}n/{e}e/F{F}/H4x{hidden // 4}',
            'value': round(dt, 3), 'unit': 's/step',
            'loss': round(float(loss), 4),
            'edges_per_s': round(2 * e_eff / dt),
            'dispatch_blocks': kblocks,
            'bwd_src_sorted': bwd_src_sorted,
            'path': 'flash scan, multi-dispatch (scatter impl)',
            'backend': jax.default_backend()}


def run_sol(coo, n, e, feats=100):
    """Scatter-gather speed-of-light probe: the irreducible ops of any
    sparse aggregation at this scale — one random row gather of the
    edge list's sources and one dst-sorted chunked scatter-add — timed
    RAW on the same graph, then our windowed SpMM as a fraction of
    their sum. This is the honest denominator for '% of achievable':
    the naive E*F-bytes HBM-roofline model is unreachable for ANY
    row-gather formulation on this hardware (measured ~70-90 GB/s
    effective gather vs 819 GB/s streaming)."""
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_tpu.edge_index import (EdgeIndex,
                                                  build_windowed_csc)
    from pytorch_geometric_tpu.ops.spmm import _windowed_spmm

    rng = np.random.default_rng(3)
    x = jax.device_put(
        rng.standard_normal((n, feats)).astype(np.float32))
    order = np.argsort(coo[1], kind='stable')
    S = jax.device_put(coo[0][order])
    D = jax.device_put(np.minimum(coo[1][order], n).astype(np.int32))
    win = jax.device_put(build_windowed_csc(coo, n, n))
    win_t = jax.device_put(build_windowed_csc(coo[::-1], n, n))

    def force(o):
        return float(jnp.sum(o))

    def timeit(f, *a, reps=2):
        force(f(*a))
        force(f(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            force(f(*a))
        return (time.perf_counter() - t0) / reps

    # chunked raw passes at the same chunk size the windowed op uses
    c = 1 << 21
    nc = -(-e // c)
    pad = nc * c - e
    S_ch = jax.device_put(np.pad(np.asarray(S), (0, pad)).reshape(nc, c))
    D_ch = jax.device_put(np.pad(np.asarray(D), (0, pad),
                                 constant_values=n).reshape(nc, c))

    @jax.jit
    def raw_gather(x, S_ch):
        def body(acc, s):
            return acc + x[s].sum(0), None
        acc, _ = jax.lax.scan(body, jnp.zeros((feats,)), (S_ch,))
        return acc

    @jax.jit
    def raw_scatter(x, S_ch, D_ch):
        def body(acc, args):
            s, d = args
            return acc.at[d].add(x[s], mode='drop',
                                 indices_are_sorted=True), None
        acc, _ = jax.lax.scan(body, jnp.zeros((n, feats)),
                              (S_ch, D_ch))
        return acc

    @jax.jit
    def ours(win, win_t, x):
        return _windowed_spmm(win, win_t, None, x, n, n)

    t_gather = timeit(raw_gather, x, S_ch)
    t_full = timeit(raw_scatter, x, S_ch, D_ch)
    t_ours = timeit(ours, win, win_t, x)
    return {'metric': 'spmm_speed_of_light_probe',
            'graph': f'{n}n/{e}e/F{feats}',
            'raw_gather_s': round(t_gather, 3),
            'raw_gather_scatter_s': round(t_full, 3),
            'windowed_spmm_s': round(t_ours, 3),
            'pct_of_gather_scatter_sol': round(
                100 * t_full / t_ours, 1),
            'gather_gbps_effective': round(
                e * feats * 4 / t_gather / 1e9, 1),
            'backend': jax.default_backend()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--train', action='store_true')
    ap.add_argument('--gat', action='store_true',
                    help='full-graph GAT train step (flash scan)')
    ap.add_argument('--gat-md', action='store_true',
                    help='full-graph GAT step as K dispatches '
                         '(dodges the tunnel per-execution limit)')
    ap.add_argument('--kblocks', type=int, default=8)
    ap.add_argument('--no-bwd-src', action='store_true',
                    help='gat-md: keep dst-sorted chunks in backward')
    ap.add_argument('--check', action='store_true',
                    help='gat-md: assert loss parity vs the '
                         'single-dispatch step')
    ap.add_argument('--sol', action='store_true',
                    help='scatter-gather speed-of-light probe')
    ap.add_argument('--infer', action='store_true')
    ap.add_argument('--scale', type=float, default=1.0,
                    help='shrink the graph (0.1 -> 245k nodes) for '
                         'smoke runs')
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--scan', type=int, default=10)
    ap.add_argument('--workers', type=int, default=4)
    ap.add_argument('--overlap', action='store_true',
                    help='pipeline group k+1 upload under group k '
                         'compute (double-buffered)')
    ap.add_argument('--hidden', type=int, default=64)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if not (args.train or args.infer or args.gat or args.gat_md
            or args.sol):
        args.train = args.infer = True

    t0 = time.perf_counter()
    coo, n, e = build_products_like(scale=args.scale)
    gen_s = time.perf_counter() - t0
    print(json.dumps({'probe': 'graph_gen_s', 'value': round(gen_s, 1),
                      'n': n, 'e': e}), flush=True)
    if args.infer:
        print(json.dumps(run_infer(coo, n, e, args.hidden,
                                   bf16=args.bf16)), flush=True)
    if args.gat:
        print(json.dumps(run_gat(coo, n, e, args.hidden)), flush=True)
    if args.gat_md:
        print(json.dumps(run_gat_md(coo, n, e, args.hidden,
                                    kblocks=args.kblocks,
                                    check=args.check,
                                    bwd_src_sorted=not args.no_bwd_src)),
              flush=True)
    if args.sol:
        print(json.dumps(run_sol(coo, n, e)), flush=True)
    if args.train:
        print(json.dumps(run_train(coo, n, e, args.steps, args.scan,
                                   args.workers,
                                   overlap=args.overlap)), flush=True)


if __name__ == '__main__':
    main()
