"""Multi-host partition-parallel training (reference
``examples/distributed/pyg/node_ogb_cpu.py`` flow, TPU redesign).

One script, two roles:

* **launcher** (no ``--rank``): partitions a graph into per-host dirs
  (META + node-map books, reference ``distributed/partition.py:121``)
  and spawns ``--nprocs`` worker processes of itself — the reference's
  simulate-hosts-with-local-processes trick
  (``testing/distributed.py:59``). On a real pod, skip the launcher and
  start one process per host with ``--rank`` /
  ``--coordinator host:port``.
* **worker** (``--rank R``): ``jax.distributed`` init, loads ONLY its
  partitions' shards, joins the global mesh, and runs the jitted
  partition-parallel train step (sparse boundary halo over
  collectives — no RPC, no per-hop merge).
"""
import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile

import numpy as np


def launch(args):
    root = args.root or tempfile.mkdtemp(prefix='pgt_parts_')
    # build + partition once, host-side (CPU: the partitioner never
    # needs a device, and touching a remote TPU here can hang)
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import pytorch_geometric_tpu as pgt
    from pytorch_geometric_tpu import distributed as dist

    data = pgt.datasets.FakeDataset(avg_num_nodes=1200, avg_degree=10,
                                    num_channels=32, num_classes=8)[0]
    dist.Partitioner(data, num_parts=args.nprocs,
                     root=root).generate_partition()
    with open(osp.join(root, 'hyper.json'), 'w') as f:
        json.dump({'F': 32, 'H': 64, 'C': 8}, f)
    print(f'partitioned into {root}')

    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    procs = [subprocess.Popen(
        [sys.executable, osp.abspath(__file__), '--root', root,
         '--rank', str(r), '--nprocs', str(args.nprocs),
         '--coordinator', f'localhost:{args.port}',
         '--steps', str(args.steps)], env=env)
        for r in range(args.nprocs)]
    rc = [p.wait(timeout=900) for p in procs]
    assert all(r == 0 for r in rc), rc
    print('all workers finished')


def work(args):
    # CPU simulation: one virtual device per "host". On real TPU hosts,
    # drop these two lines — each process sees its local chips.
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    os.environ.setdefault('XLA_FLAGS',
                          '--xla_force_host_platform_device_count=1')
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import optax

    from pytorch_geometric_tpu import distributed as dist
    from pytorch_geometric_tpu.distributed.runtime import (
        assemble_shard_leaves, load_local_shards)
    from pytorch_geometric_tpu.parallel.models import (
        init_gcn_params, partition_gcn_apply)

    ctx = dist.init_process(coordinator_address=args.coordinator,
                            num_processes=args.nprocs,
                            process_id=args.rank)
    mesh = dist.global_mesh()
    local = load_local_shards(args.root, mesh)   # only MY partitions
    shard = dist.process_local_shard(mesh, assemble_shard_leaves(local))

    with open(osp.join(args.root, 'hyper.json')) as f:
        hp = json.load(f)
    params = init_gcn_params(jax.random.PRNGKey(0), hp['F'], hp['H'],
                             hp['C'])
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = dist.make_dist_train_step(mesh, partition_gcn_apply, tx)
    with mesh:
        for i in range(args.steps):
            params, opt_state, loss = step(params, opt_state, shard)
            if args.rank == 0:
                print(f'step {i}: loss '
                      f'{float(np.asarray(jax.device_get(loss))):.4f}',
                      flush=True)
    dist.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nprocs', type=int, default=2)
    ap.add_argument('--steps', type=int, default=8)
    ap.add_argument('--rank', type=int, default=None)
    ap.add_argument('--root', default=None)
    ap.add_argument('--port', type=int,
                    default=29500 + os.getpid() % 500)
    ap.add_argument('--coordinator', default=None)
    args = ap.parse_args()
    if args.rank is None:
        launch(args)
    else:
        work(args)


if __name__ == '__main__':
    main()
