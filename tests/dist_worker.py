"""Worker process for the 2-process multi-host test (the reference's own
trick: spawn local processes to simulate hosts,
``torch_geometric/testing/distributed.py:59``).

argv: root pid nprocs port steps out_file
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import json  # noqa: E402

import numpy as np  # noqa: E402
import optax  # noqa: E402


def main():
    root, pid, nprocs, port, steps, out_file = sys.argv[1:7]
    pid, nprocs, steps = int(pid), int(nprocs), int(steps)

    from pytorch_geometric_tpu import distributed as dist
    from pytorch_geometric_tpu.distributed.runtime import (
        assemble_shard_leaves, load_local_shards, local_partition_ids)
    from pytorch_geometric_tpu.parallel.models import (
        init_gcn_params, partition_gcn_apply)

    ctx = dist.init_process(coordinator_address=f'localhost:{port}',
                            num_processes=nprocs, process_id=pid)
    assert ctx.rank == pid and ctx.world_size == nprocs
    mesh = dist.global_mesh()
    assert mesh.devices.size == nprocs  # 1 chip per "host"

    # per-host loading: this process touches ONLY its partitions' dirs
    my_pids = local_partition_ids(mesh)
    local = load_local_shards(root, mesh)

    # global-consistency invariant (reference test_dist_neighbor_sampler
    # asserts n_id[edge_index] == global edge endpoints): every local
    # edge, re-addressed through [own | recv]-buffer positions and the
    # partition book, must resolve to an edge of the global graph.
    meta, node_map, global_pos = dist.load_partition_books(root)
    global_edges = np.load(os.path.join(root, 'global_edges.npy'))
    edge_set = set(map(tuple, global_edges.T.tolist()))
    for k, gpid in enumerate(my_pids):
        part = dist.load_partition(root, gpid)
        em = part['edge_mask']
        n_max = meta['n_max']
        # global_pos is part*n_max+local_pos — invert it by table
        pos2id = np.full(meta['num_parts'] * n_max, -1, np.int64)
        pos2id[global_pos] = np.arange(meta['num_nodes'])
        src_global = pos2id[part['edge_src'][em]]
        dst_global = pos2id[gpid * n_max + part['edge_dst'][em]]
        assert (src_global >= 0).all() and (dst_global >= 0).all()
        assert (node_map[dst_global] == gpid).all()
        for s, d in zip(src_global[:200], dst_global[:200]):
            assert (int(s), int(d)) in edge_set

    shard = dist.process_local_shard(mesh, assemble_shard_leaves(local))

    with open(os.path.join(root, 'hyper.json')) as f:
        hp = json.load(f)
    params = init_gcn_params(jax.random.PRNGKey(0), hp['F'], hp['H'],
                             hp['C'])
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = dist.make_dist_train_step(mesh, partition_gcn_apply, tx)
    losses = []
    with mesh:
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, shard)
            losses.append(float(np.asarray(jax.device_get(loss))))
    if pid == 0:
        with open(out_file, 'w') as f:
            json.dump({'losses': losses}, f)
    dist.shutdown()
    print(f'worker {pid} ok', flush=True)


if __name__ == '__main__':
    main()
