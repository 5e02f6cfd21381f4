"""Heterogeneous end-to-end benchmark (VERDICT r3 #4).

Whole-model train-step timing at the OGB-MAG shape — 4 node types /
7 edge types with realistic skew (paper 736k / author 1.1M /
institution 8.7k / field 60k; cites 5.4M / writes 7.1M / has_topic
7.5M / affiliated 1.04M + reverses) — for:

  * HGT (2 layers, hidden 64, 4 heads)      — typed QKV + relation
    attention (reference ``nn/conv/hgt_conv.py:17``)
  * FastRGCN (2 layers, hidden 64)          — per-relation weights
    gathered per edge (reference ``nn/conv/rgcn_conv.py:302``)

plus a typed-projection strategy A/B at the same type skew (per-type
GEMM vs sort+ragged_dot vs dense einsum — the three
``ops/grouped.py`` strategies behind HeteroLinear / the reference's
``segment_matmul``, ``nn/dense/linear.py:255``).

``--reference`` runs the same protocol through the actual reference
PyG (torch, CPU eager — the only hardware it has here) for a
same-machine yardstick; the reference publishes no hetero numbers.

Prints one JSON line per arm.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# OGB-MAG counts (ogb.nodeproppred 'ogbn-mag')
MAG_NODES = {'paper': 736_389, 'author': 1_134_649,
             'institution': 8_740, 'field': 59_965}
MAG_EDGES = {
    ('author', 'affiliated_with', 'institution'): 1_043_998,
    ('author', 'writes', 'paper'): 7_145_660,
    ('paper', 'cites', 'paper'): 5_416_271,
    ('paper', 'has_topic', 'field'): 7_505_078,
}
F, C = 64, 8


def build_mag_like(scale=1.0, seed=0, reverse=True):
    rng = np.random.default_rng(seed)
    nodes = {t: max(int(n * scale), 8) for t, n in MAG_NODES.items()}
    edges = {}
    for (s, r, d), e in MAG_EDGES.items():
        e = max(int(e * scale), 16)
        coo = np.stack([rng.integers(0, nodes[s], e),
                        rng.integers(0, nodes[d], e)]).astype(np.int32)
        edges[(s, r, d)] = coo
        if reverse and s != d:
            edges[(d, f'rev_{r}', s)] = coo[::-1].copy()
    x = {t: rng.standard_normal((n, F)).astype(np.float32)
         for t, n in nodes.items()}
    y = rng.integers(0, C, nodes['paper']).astype(np.int32)
    return nodes, edges, x, y


def _force(out):
    """Force completion with a D2H pull of ONE scalar (sum reduced on
    device): block_until_ready returns early on the remote tunnel
    backend, and pulling a full array would time the tunnel's D2H
    bandwidth instead of the compute (r4 debugging)."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return float(jnp.sum(leaf))


def _timeit_step(step, args, reps):
    out = step(*args)                      # compile
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps, out


def run_hgt(nodes, edges, x, y, reps, remat=False, blocked=True,
            attn_path=None, layouts=False):
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as fnn
    from pytorch_geometric_tpu.nn import HGTConv

    metadata = (tuple(nodes), tuple(edges))
    # remat trades one recompute for the per-edge [E, H, D] k/v
    # activations the backward would otherwise keep live (the
    # jax.checkpoint half of the reference's 'trade FLOPs for memory'
    # recipe) — lets full MAG scale fit one 16 GB chip
    Conv = fnn.remat(HGTConv) if remat else HGTConv

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, x_dict, ei_dict, flash_layouts=None):
            x_dict = Conv(64, metadata, heads=4, attn_path=attn_path)(
                x_dict, ei_dict, flash_layouts)
            x_dict = Conv(64, metadata, heads=4, attn_path=attn_path)(
                x_dict, ei_dict, flash_layouts)
            return fnn.Dense(C)(x_dict['paper'])

    net = Net()
    X = {t: jax.device_put(v) for t, v in x.items()}
    # blocked layouts per relation: routes HGT's edge softmax through
    # the fused SDDMM+segment-softmax Pallas kernel (ops/sddmm.py,
    # 4.2x over the XLA gather path) instead of raw-COO scatter
    from pytorch_geometric_tpu import EdgeIndex
    EI = {}
    for et, coo in edges.items():
        s, _, d = et
        if blocked:
            EI[et] = EdgeIndex(coo, (nodes[s], nodes[d])).fill_cache(
                blocked=True)
        else:
            EI[et] = jax.device_put(coo)
    Y = jax.device_put(y)
    FL = None
    if layouts:
        # host-presorted chunked unions: removes the per-step device
        # argsort (2 layers x ~E edges x ~6 ns) AND pins sorted
        # lowering; forces the flash path for every dst type
        from pytorch_geometric_tpu.ops import build_hgt_flash_layouts
        FL = build_hgt_flash_layouts(metadata, edges, nodes)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), X, EI, FL)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, X, EI, Y, FL):
        def loss_fn(p):
            logits = net.apply(p, X, EI, FL)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, Y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    dt, (params, opt, loss) = _timeit_step(
        step, (params, opt, X, EI, Y, FL), reps)
    e_total = sum(c.shape[1] for c in edges.values())
    return {'metric': 'hetero_hgt_train_step', 'value': round(dt, 4),
            'unit': 's/step', 'loss': round(float(loss), 4),
            'edges_per_s': round(e_total / dt),
            'backend': jax.default_backend()}


def run_rgcn(nodes, edges, x, y, reps):
    """FastRGCN on the homogenised graph (offsets per type, one edge
    list + edge-type vector — the reference's to_homogeneous path)."""
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as fnn
    from pytorch_geometric_tpu.nn import FastRGCNConv

    types = list(nodes)
    offs = {}
    off = 0
    for t in types:
        offs[t] = off
        off += nodes[t]
    n_all = off
    coos, etys = [], []
    for i, ((s, r, d), coo) in enumerate(edges.items()):
        coos.append(coo + np.array([[offs[s]], [offs[d]]], np.int32))
        etys.append(np.full(coo.shape[1], i, np.int32))
    coo = np.concatenate(coos, 1)
    ety = np.concatenate(etys)
    xs = np.zeros((n_all, F), np.float32)
    for t in types:
        xs[offs[t]:offs[t] + nodes[t]] = x[t]

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, xx, coo, ety):
            h = fnn.relu(FastRGCNConv(
                64, num_relations=len(edges))(xx, coo, ety))
            h = FastRGCNConv(64, num_relations=len(edges))(h, coo, ety)
            return fnn.Dense(C)(h)

    net = Net()
    X = jax.device_put(xs)
    COO = jax.device_put(coo)
    ETY = jax.device_put(ety)
    Y = jax.device_put(y)
    p_off, p_n = offs['paper'], nodes['paper']
    params = jax.jit(net.init)(jax.random.PRNGKey(0), X, COO, ETY)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, X, COO, ETY, Y):
        def loss_fn(p):
            logits = net.apply(p, X, COO, ETY)[p_off:p_off + p_n]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, Y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    dt, (params, opt, loss) = _timeit_step(
        step, (params, opt, X, COO, ETY, Y), reps)
    return {'metric': 'hetero_fastrgcn_train_step',
            'value': round(dt, 4), 'unit': 's/step',
            'loss': round(float(loss), 4),
            'edges_per_s': round(coo.shape[1] / dt),
            'backend': jax.default_backend()}


def run_projection_ab(nodes, x, reps):
    """Typed-projection strategy A/B at the MAG node-type skew: the
    whole-model default is chosen from this (per-type GEMM wins at 4
    fat types; ragged_dot wins past ~16 skewed types —
    benchmarks/grouped_bench.py)."""
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_tpu.ops import (build_ragged_layout,
                                           typed_matmul)

    types_sorted = list(nodes)
    R = len(types_sorted)
    rows = np.concatenate([np.full(nodes[t], i, np.int64)
                           for i, t in enumerate(types_sorted)])
    xs = np.concatenate([x[t] for t in types_sorted], 0)
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((R, F, 64)).astype(np.float32)
                    / np.sqrt(F))
    X = jax.device_put(xs)

    out = {}
    # arm 1: per-type GEMM (what HGTConv does)
    sl = {}
    off = 0
    for t in types_sorted:
        sl[t] = (off, off + nodes[t])
        off += nodes[t]

    @jax.jit
    def per_type(X, W):
        return jnp.concatenate([
            X[sl[t][0]:sl[t][1]] @ W[i]
            for i, t in enumerate(types_sorted)], 0)

    dt, _ = _timeit_step(per_type, (X, W), reps)
    out['per_type_gemm_s'] = round(dt, 5)

    # arm 2: ragged_dot over the type-sorted rows
    layout = build_ragged_layout(rows, R)

    @jax.jit
    def ragged(X, W):
        return typed_matmul(X, None, W, layout=layout)

    dt, _ = _timeit_step(ragged, (X, W), reps)
    out['ragged_dot_s'] = round(dt, 5)

    # arm 3: dense typed einsum (R-x FLOP waste)
    rows_j = jax.device_put(rows)

    @jax.jit
    def dense(X, W):
        return jnp.einsum('nf,nfo->no', X, W[rows_j])

    dt, _ = _timeit_step(dense, (X, W), reps)
    out['dense_einsum_s'] = round(dt, 5)
    out['metric'] = 'hetero_typed_projection_ab'
    out['rows'] = int(xs.shape[0])
    out['types'] = R
    return out


def run_reference(scale, reps):
    """Reference PyG HGT train step, torch CPU eager (same synthetic
    graph) — the only hardware the reference has in this environment."""
    import torch
    sys.path.insert(0, '/root/reference')
    from torch_geometric.nn import HGTConv as RefHGT
    nodes, edges, x, y = build_mag_like(scale)
    metadata = (list(nodes), list(edges))
    xd = {t: torch.from_numpy(v) for t, v in x.items()}
    eid = {et: torch.from_numpy(coo.astype(np.int64)) for et, coo
           in edges.items()}
    yt = torch.from_numpy(y.astype(np.int64))

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = RefHGT(F, 64, metadata, heads=4)
            self.c2 = RefHGT(64, 64, metadata, heads=4)
            self.lin = torch.nn.Linear(64, C)

        def forward(self, xd, eid):
            h = self.c1(xd, eid)
            h = self.c2(h, eid)
            return self.lin(h['paper'])

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(net(xd, eid), yt)
        loss.backward()
        opt.step()
        return float(loss)

    loss = step()                          # warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        loss = step()
    dt = (time.perf_counter() - t0) / reps
    e_total = sum(c.shape[1] for c in edges.values())
    return {'metric': 'hetero_hgt_train_step_reference',
            'value': round(dt, 4), 'unit': 's/step',
            'loss': round(loss, 4), 'edges_per_s': round(e_total / dt),
            'backend': 'torch-cpu-eager'}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scale', type=float, default=0.25)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--reference', action='store_true',
                    help='run the torch reference arm instead')
    ap.add_argument('--arms', default='hgt,rgcn,proj')
    ap.add_argument('--remat', action='store_true')
    ap.add_argument('--layouts', action='store_true',
                    help='host-presorted flash unions (no per-step '
                         'device argsort; forces the flash path)')
    ap.add_argument('--attn-path', default=None,
                    choices=['fused', 'concat', 'blocked'],
                    help='HGT aggregation path (default: auto — fused '
                         'for raw COO, blocked kernel when blocked '
                         'caches are supplied)')
    ap.add_argument('--no-blocked', action=argparse.BooleanOptionalAction,
                    default=True,
                    help='raw-COO HGT path (default: measured FASTER '
                         'than the fused blocked arm at H=4/D=16 MAG '
                         'shapes — 6.9 vs 8.5 s/step; pass '
                         '--no-no-blocked to A/B the fused arm)')
    args = ap.parse_args()

    if args.reference:
        print(json.dumps(run_reference(args.scale, max(args.reps, 2))))
        return
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    nodes, edges, x, y = build_mag_like(args.scale)
    e_total = sum(c.shape[1] for c in edges.values())
    print(json.dumps({'probe': 'graph', 'scale': args.scale,
                      'nodes': nodes, 'edges_total': e_total}),
          flush=True)
    arms = args.arms.split(',')
    if 'hgt' in arms:
        rec = run_hgt(nodes, edges, x, y, args.reps,
                      remat=args.remat, blocked=not args.no_blocked,
                      attn_path=args.attn_path, layouts=args.layouts)
        rec['remat'] = args.remat
        rec['flash_layouts'] = args.layouts
        rec['blocked'] = not args.no_blocked
        rec['attn_path'] = args.attn_path or 'auto'
        print(json.dumps(rec), flush=True)
    if 'rgcn' in arms:
        print(json.dumps(run_rgcn(nodes, edges, x, y, args.reps)),
              flush=True)
    if 'proj' in arms:
        print(json.dumps(run_projection_ab(nodes, x, args.reps)),
              flush=True)


if __name__ == '__main__':
    main()
