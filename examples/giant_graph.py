"""Giant-graph training on one chip: the regimes past dense/BSR.

Two capabilities the reference stack has no single-device answer for:

1. **Full-graph SpMM at ogbn-products scale** — `fill_cache(auto=True)`
   builds the dst-sorted WindowedCSC layout past 16.7M edges and
   `spmm` scans it with `indices_are_sorted` scatter-adds (95.3% of the
   measured scatter-gather speed of light on v5e; see
   `benchmarks/products_bench.py --sol`).
2. **Full-graph attention** — `GATConv` / `GATv2Conv` / `HGTConv` /
   `TransformerConv` / `HANConv` auto-dispatch to the online-softmax
   flash scan (`ops/edge_attention.py`) past `PGT_ATTN_WIDE_BYTES`:
   peak HBM is one edge chunk, so 62M-edge GAT and full-OGB-MAG HGT
   train on a 16 GB chip while any `[E, H]`-materialising formulation
   needs hundreds of GB.

This example runs a scaled-down version (so it works anywhere,
including CPU); crank ``--nodes/--edges`` on real hardware. The flash
path is forced via the env caps to demonstrate the dispatch.
"""
import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nodes', type=int, default=2000)
    ap.add_argument('--edges', type=int, default=20000)
    ap.add_argument('--steps', type=int, default=20)
    args = ap.parse_args()

    # force the giant-graph paths at toy scale (delete these two lines
    # on a real giant graph — the caps default to ~1 GB)
    os.environ.setdefault('PGT_ATTN_WIDE_BYTES', '1')
    os.environ.setdefault('PGT_ATTN_CHUNK_EDGES', '4096')
    os.environ.setdefault('PGT_AUTO_WIN_MIN_EDGES', '1000')
    os.environ.setdefault('PGT_DENSE_SPMM_ENTRIES', '100')

    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as fnn
    from pytorch_geometric_tpu import EdgeIndex
    from pytorch_geometric_tpu.nn import GATConv, SAGEConv
    from pytorch_geometric_tpu.ops import spmm_regime

    n, e = args.nodes, args.edges
    rng = np.random.default_rng(0)
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 7, n).astype(np.int32))

    # windowed SpMM regime for the SAGE layer
    ei = EdgeIndex(coo, (n, n)).fill_cache(auto=True,
                                           block_sparse=False)
    print(f'spmm regime: {spmm_regime(ei)}')

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, x, ei, coo):
            x = fnn.relu(SAGEConv(out_channels=32)(x, ei))
            # flash-scan attention layer (auto past the wide cap)
            x = fnn.relu(GATConv(out_channels=8, heads=4)(x, coo))
            return fnn.Dense(7)(x)

    net = Net()
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, ei, coo)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, ei, coo, y):
        def loss_fn(p):
            logits = net.apply(p, x, ei, coo)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt, loss = step(params, opt, x, ei, coo, y)
    loss = float(loss)
    dt = time.perf_counter() - t0
    logits = net.apply(params, x, ei, coo)
    acc = float((jnp.argmax(logits, -1) == y).mean())
    print(f'{args.steps} steps in {dt:.2f}s  loss {loss:.4f}  '
          f'train acc {acc:.3f}')


if __name__ == '__main__':
    main()
