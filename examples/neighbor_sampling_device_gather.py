"""Production mini-batch pipeline — the DEFAULT sampled-training path.

Three TPU-native choices, each measured:

1. **Structure-only sampling** (``filter_features=False``): the host
   feature join dominates batch time at wide feature dims (3x on the
   500k-node config); instead ``X``/``Y`` live on the device once and
   rows are gathered by ``batch.n_id`` inside the jitted step.
2. **Prefetch threads** overlap the C++ sampler with device compute.
3. **K steps per dispatch** (``lax.scan`` over ``stack_batches``):
   per-batch dispatch pays one host->device round trip per optimiser
   step — the wall once sampling and compute are fast (products-scale
   bench: host wait 4%, dispatch the rest). One scan dispatch amortises
   it K-fold. Padding contract: all K batches share NeighborLoader's
   fixed padded shapes, so the scan compiles exactly once
   (``loader/scan_train.py``).

Compare with ``neighbor_sampling.py`` (host-joined per-batch variant,
the reference's default flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.loader import (NeighborLoader, PrefetchLoader,
                                          make_device_train_step,
                                          stack_batches)
from pytorch_geometric_tpu.nn.models import GraphSAGE

K = 8     # optimiser steps per device dispatch


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=2000, avg_degree=12,
                                    num_channels=32, num_classes=7)[0]
    # device-resident feature/label tables (uploaded once)
    X = jnp.asarray(np.asarray(data.x))
    Y = jnp.asarray(np.asarray(data.y).astype(np.int32))

    loader = NeighborLoader(data, num_neighbors=[15, 10], batch_size=64,
                            shuffle=True, num_workers=2,
                            filter_features=False)
    model = GraphSAGE(hidden_channels=64, num_layers=2, out_channels=7)
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), X[:b0.num_nodes],
                        np.asarray(b0.edge_index))
    tx = optax.adam(5e-3)
    opt = tx.init(params)
    _, scan_fn = make_device_train_step(model, tx)

    for epoch in range(3):
        # put=False: the producer thread only samples — the K-group is
        # stacked on the host and crosses the link in ONE upload
        it = PrefetchLoader(loader, num_threads=2, put=False)
        group, loss = [], None
        for b in it:
            group.append(b)
            if len(group) == K:
                params, opt, loss = scan_fn(params, opt, X, Y,
                                            stack_batches(group))
                group = []
        if group:      # tail: pad the group by repeating the last batch
            while len(group) < K:
                group.append(group[-1])
            params, opt, loss = scan_fn(params, opt, X, Y,
                                        stack_batches(group))
        print(f'epoch {epoch}: loss {float(loss):.4f}')


if __name__ == '__main__':
    main()
