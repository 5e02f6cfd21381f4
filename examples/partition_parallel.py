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


if __name__ == '__main__':
    main()
