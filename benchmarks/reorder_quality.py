"""Block-fill quality of node reorderings (host-only, no device).

The cached block-sparse SpMM (``ops/bsr_spmm.py``) streams nonempty
128x128 blocks; its cost scales with block count, so the captured-edge
fraction at a given min-fill and the nonempty-block count ARE the perf
model. This prints both for each ordering on three graph families.

Run: python benchmarks/reorder_quality.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
from pytorch_geometric_tpu.utils.reorder import (  # noqa: E402
    block_fill_stats, cluster_order, degree_order, reverse_cuthill_mckee)


def powerlaw(rng, n, e, alpha=0.9):
    w = np.arange(1, n + 1) ** -alpha
    w /= w.sum()
    src, dst = rng.choice(n, e, p=w), rng.choice(n, e, p=w)
    sc = rng.permutation(n)           # scramble the natural order
    return np.stack([sc[src], sc[dst]])


def sbm(rng, n, e, k=50):
    blk = rng.integers(0, k, n)
    intra = rng.random(e) < 0.9
    src = rng.integers(0, n, e)
    # intra-edges: rewire dst into src's block
    members = [np.where(blk == b)[0] for b in range(k)]
    dst = rng.integers(0, n, e)
    for i in np.where(intra)[0]:
        m = members[blk[src[i]]]
        dst[i] = m[rng.integers(0, len(m))]
    sc = rng.permutation(n)
    return np.stack([sc[src], sc[dst]])


def grid(n_side):
    ij = np.arange(n_side * n_side).reshape(n_side, n_side)
    h = np.stack([ij[:, :-1].ravel(), ij[:, 1:].ravel()])
    v = np.stack([ij[:-1, :].ravel(), ij[1:, :].ravel()])
    coo = np.concatenate([h, v, h[::-1], v[::-1]], 1)
    rng = np.random.default_rng(0)
    sc = rng.permutation(n_side * n_side)
    return np.stack([sc[coo[0]], sc[coo[1]]])


def main():
    rng = np.random.default_rng(0)
    cases = [
        ('powerlaw 100k/1M', powerlaw(rng, 100_000, 1_000_000), 100_000),
        ('sbm 50k/500k', sbm(rng, 50_000, 500_000), 50_000),
        ('grid 300x300', grid(300), 90_000),
    ]
    orders = [('natural', None), ('degree', degree_order),
              ('rcm', reverse_cuthill_mckee), ('cluster', cluster_order)]
    for name, coo, n in cases:
        print(f'== {name}')
        for oname, fn in orders:
            t0 = time.time()
            if fn is None:
                c2 = coo
            else:
                perm = fn(coo, n)
                inv = np.empty(n, np.int64)
                inv[perm] = np.arange(n)
                c2 = inv[coo]
            cap, epb, nb = block_fill_stats(c2, n)
            print(f'  {oname:8s} captured={cap:.3f} edges/blk={epb:6.2f} '
                  f'blocks={nb:7d}  ({time.time() - t0:.1f}s)')


if __name__ == '__main__':
    main()
