"""Multi-chip partition-parallel full-graph training (the reference's
``distributed/`` + ``examples/multi_gpu`` redesigned as mesh
collectives). Runs on any device count — use
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to simulate 8 chips."""
import jax
import numpy as np
from jax.sharding import Mesh

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.parallel import train_partition_parallel


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=4000, avg_degree=10,
                                    num_channels=32, num_classes=8)[0]
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ('graph',))
    params, losses = train_partition_parallel(
        data, num_parts=n_dev, hidden=64, num_steps=30, lr=1e-2,
        mesh=mesh)
    print(f'{n_dev} devices; loss {losses[0]:.4f} -> {losses[-1]:.4f}')

    # Power-law graphs defeat edge-cut partitioning (hubs touch most
    # edges); hub_frac replicates the top-degree nodes instead — their
    # sources ride one all_gather per layer, their in-edges are merged
    # at the source part and shipped via one psum_scatter
    # (parallel/spmm.py::partition_spmm_hub; quality numbers in
    # benchmarks/partition_quality.py).
    rng = np.random.default_rng(0)
    n, e = 4000, 24000
    src = (n * rng.random(e) ** 3).astype(np.int64)     # hub-skewed
    coo = np.stack([np.concatenate([src, rng.integers(0, n, e)]),
                    np.concatenate([rng.integers(0, n, e), src])])
    pl = pgt.Data(x=rng.standard_normal((n, 32)).astype(np.float32),
                  edge_index=coo.astype(np.int32),
                  y=rng.integers(0, 8, n).astype(np.int32), num_nodes=n)
    params, losses = train_partition_parallel(
        pl, num_parts=n_dev, hidden=64, num_steps=30, lr=1e-2,
        mesh=mesh, hub_frac=0.05)
    print(f'power-law + 5% hub replication; '
          f'loss {losses[0]:.4f} -> {losses[-1]:.4f}')


if __name__ == '__main__':
    main()
