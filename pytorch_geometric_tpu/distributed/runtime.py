"""Multi-host mesh + train-step assembly.

The reference's multi-node runtime is torch.distributed DDP over
per-host sampled batches. The TPU runtime instead builds ONE global
``Mesh`` spanning every process's chips; each host materialises only its
partitions' arrays and contributes them via
``jax.make_array_from_process_local_data`` — the sparse-halo exchange
(``parallel/spmm.py``) then runs over ICI/DCN collectives with no
host-side merge step.
"""

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .partition_io import load_partition, load_partition_books


def global_mesh(axis_name: str = 'graph') -> Mesh:
    """1-D mesh over every device of every process (device order — which
    fixes which partition lands on which chip — is ``jax.devices()``:
    process-major, so host r's chips carry partitions
    ``[r*local, (r+1)*local)``)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_partition_ids(mesh: Mesh) -> List[int]:
    """Partition indices this process must load: the mesh positions of
    its own devices (the per-host shard list the reference keeps in
    ``DistContext`` + ``node_map``)."""
    me = jax.process_index()
    return [i for i, d in enumerate(mesh.devices.ravel())
            if d.process_index == me]


def process_local_shard(mesh: Mesh, tree, axis_name: str = 'graph'):
    """Wrap per-host stacked arrays (leading dim = #local partitions)
    into global arrays sharded along ``axis_name``. Works single- and
    multi-process (``jax.make_array_from_process_local_data``)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def wrap(a):
        a = np.asarray(a)
        s = NamedSharding(mesh, P(*((axis_name,) + (None,) * (a.ndim - 1))))
        return jax.make_array_from_process_local_data(s, a)

    return jax.tree_util.tree_map(wrap, tree)


def load_local_shards(root: str, mesh: Mesh) -> Dict[str, np.ndarray]:
    """Each host reads ONLY its partitions' dirs (reference
    ``partition.py`` per-host ``load_partition_info``) and stacks them
    to ``[local_parts, ...]`` ready for :func:`process_local_shard`."""
    pids = local_partition_ids(mesh)
    parts = [load_partition(root, pid) for pid in pids]
    keys = [k for k in parts[0] if not k.startswith('sample_')]
    return {k: np.stack([p[k] for p in parts]) for k in keys}


def assemble_shard_leaves(local: Dict[str, np.ndarray],
                          train_mask: Optional[np.ndarray] = None):
    """Order a host's ``load_local_shards`` dict into the leaf tuple
    :func:`parallel.models.partition_gcn_apply` expects. ``train_mask``
    is GLOBAL (indexed by global node id); defaults to all owned."""
    own, own_mask = local['own'], local['own_mask']
    if train_mask is not None:
        tm = np.asarray(train_mask)[own.reshape(-1)].reshape(own.shape)
        tm = tm & own_mask
    else:
        tm = own_mask
    ew = local.get('edge_weight')
    if ew is None:
        ew = np.ones_like(local['edge_src'], np.float32)
    leaves = [local['x'].astype(np.float32),
              local['y'].astype(np.int32), own_mask, tm]
    if 'halo_send' in local:
        leaves += [local['edge_src_halo'], local['edge_dst'],
                   local['edge_mask'], ew.astype(np.float32),
                   local['halo_send'], local['halo_send_mask']]
    else:
        leaves += [local['edge_src'], local['edge_dst'],
                   local['edge_mask'], ew.astype(np.float32)]
    return tuple(leaves)


def make_dist_train_step(mesh: Mesh, model_apply, tx,
                         axis_name: str = 'graph'):
    """Jitted halo-exchange train step over the (possibly multi-host)
    mesh. Same contract as
    :func:`parallel.spmm.make_partition_gcn_step` — ``model_apply``
    runs on one partition shard inside ``shard_map`` and may call
    :func:`parallel.spmm.partition_spmm_halo`."""
    from ..parallel.spmm import make_partition_gcn_step
    return make_partition_gcn_step(mesh, model_apply, tx,
                                   axis_name=axis_name)
