"""Multi-host execution benchmark — the "N >= 2 hosts" reported point.

Spawns real OS processes joined via ``jax.distributed`` (the
reference's local-process trick, ``testing/distributed.py:59``), runs
the partition-parallel GCN train step across the process-spanning mesh,
and reports edges/s at world sizes 1 and 2.

HONESTY NOTE: in this environment the "hosts" are processes on one
machine with a CPU backend — same silicon, shared memory bandwidth —
so the ratio measures that the multi-host path executes and what the
cross-process collective overhead costs, NOT real DCN/ICI scaling
(no second TPU host is reachable; see SCALING.md for the
traffic-derived efficiency bounds on real hardware).

Usage: python benchmarks/multihost_bench.py [--nodes 20000 --degree 16]
       [--steps 10] [--hidden 64]
"""
import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r'''
import os, sys, json, time
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import optax

root, pid, nprocs, port, steps, hidden, out_file = sys.argv[1:8]
pid, nprocs, steps, hidden = int(pid), int(nprocs), int(steps), int(hidden)

from pytorch_geometric_tpu import distributed as dist
from pytorch_geometric_tpu.distributed.runtime import (
    assemble_shard_leaves, load_local_shards)
from pytorch_geometric_tpu.parallel.models import (init_gcn_params,
                                                   partition_gcn_apply)

ctx = dist.init_process(coordinator_address=f'localhost:{port}',
                        num_processes=nprocs, process_id=pid)
mesh = dist.global_mesh()
local = load_local_shards(root, mesh)
shard = dist.process_local_shard(mesh, assemble_shard_leaves(local))
with open(os.path.join(root, 'hyper.json')) as f:
    hp = json.load(f)
params = init_gcn_params(jax.random.PRNGKey(0), hp['F'], hidden, hp['C'])
tx = optax.adam(1e-2)
opt_state = tx.init(params)
step = dist.make_dist_train_step(mesh, partition_gcn_apply, tx)
with mesh:
    params, opt_state, loss = step(params, opt_state, shard)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, shard)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
if pid == 0:
    with open(out_file, 'w') as f:
        json.dump({'seconds': dt, 'loss': float(np.asarray(loss))}, f)
dist.shutdown()
'''


def run_world(root, nprocs, port, steps, hidden):
    out_file = osp.join(root, f'out_w{nprocs}.json')
    wfile = osp.join(root, 'worker.py')
    with open(wfile, 'w') as f:
        f.write(WORKER)
    env = {**os.environ, 'PYTHONPATH': REPO}
    procs = [subprocess.Popen(
        [sys.executable, wfile, root, str(i), str(nprocs), str(port),
         str(steps), str(hidden), out_file],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(nprocs)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            raise RuntimeError(f'worker failed:\n{log[-3000:]}')
    with open(out_file) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nodes', type=int, default=20_000)
    ap.add_argument('--degree', type=int, default=16)
    ap.add_argument('--features', type=int, default=64)
    ap.add_argument('--hidden', type=int, default=64)
    ap.add_argument('--steps', type=int, default=10)
    args = ap.parse_args()

    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    from pytorch_geometric_tpu import distributed as dist
    from pytorch_geometric_tpu.data import Data
    from pytorch_geometric_tpu.parallel.models import gcn_norm_weights

    rng = np.random.default_rng(0)
    n, e = args.nodes, args.nodes * args.degree
    coo = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    coo = np.concatenate(
        [coo, np.stack([np.arange(n), np.arange(n)])], 1).astype(np.int64)
    w = gcn_norm_weights(coo, n)
    c = 8
    data = Data(x=rng.standard_normal((n, args.features))
                .astype(np.float32),
                y=rng.integers(0, c, n).astype(np.int32),
                edge_index=coo.astype(np.int32), edge_weight=w,
                num_nodes=n)
    e_total = coo.shape[1]

    results = {}
    for world in (1, 2):
        root = tempfile.mkdtemp(prefix=f'mh{world}_')
        dist.Partitioner(data, num_parts=world,
                         root=root).generate_partition()
        with open(osp.join(root, 'hyper.json'), 'w') as f:
            json.dump({'F': args.features, 'H': args.hidden, 'C': c}, f)
        port = 12355 + world
        r = run_world(root, world, port, args.steps, args.hidden)
        results[world] = r
        print(json.dumps({
            'world_size': world,
            'steps': args.steps,
            'seconds': round(r['seconds'], 3),
            'edges_per_s': round(args.steps * e_total / r['seconds']),
            'loss': round(r['loss'], 4),
        }))
    ratio = results[1]['seconds'] / results[2]['seconds']
    print(json.dumps({
        'metric': 'multihost_2proc_speedup',
        'value': round(ratio, 3),
        'note': 'processes share one machine: executes the multi-host '
                'path, does not measure real DCN scaling',
    }))


if __name__ == '__main__':
    main()
