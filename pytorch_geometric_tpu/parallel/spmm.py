"""Partition-parallel message passing over a device mesh.

The TPU replacement for the reference's pull-based RPC sampling + halo
merge (``distributed/dist_neighbor_sampler.py:875-947``): graph
partitions live on devices along a ``graph`` mesh axis; each step
all-gathers owned features over ICI (statically shaped) and reduces
local edges to owned destinations. ``shard_map`` keeps the collective
explicit; XLA overlaps the gather with the local GEMMs where possible.

Gradient flow: ``shard_map`` is differentiable — the backward of the
``all_gather`` is a ``psum_scatter``, which is exactly the halo-gradient
exchange the reference would need to hand-write.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def partition_spmm(x_own: jnp.ndarray, edge_src: jnp.ndarray,
                   edge_dst: jnp.ndarray, edge_mask: jnp.ndarray,
                   edge_weight: Optional[jnp.ndarray],
                   axis_name: str = 'graph') -> jnp.ndarray:
    """One partition-parallel A^T x (dst-owned). Call INSIDE shard_map.

    x_own:    [n_max, F] this device's owned features
    edge_src: [e_max] src position in the gathered buffer
    edge_dst: [e_max] local dst position (n_max = dump row)
    """
    n_max = x_own.shape[0]
    # Halo exchange: gather every partition's owned block over ICI.
    x_full = jax.lax.all_gather(x_own, axis_name, tiled=True)  # [P*n, F]
    src = jnp.minimum(edge_src, x_full.shape[0] - 1)
    msg = x_full[src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    dst = jnp.where(edge_mask, edge_dst, n_max)
    return jax.ops.segment_sum(msg, dst, n_max + 1)[:n_max]


def make_partition_gcn_step(mesh: Mesh, model_apply, tx,
                            axis_name: str = 'graph'):
    """Build a jitted partition-parallel train step.

    ``model_apply(params, shard) -> (loss_sum, weight_sum)`` runs on one
    partition shard inside shard_map and may call ``partition_spmm``.
    Parameters are replicated; the gradient all-reduce over the mesh is
    induced by psum on the loss.
    """
    from jax import shard_map
    import optax

    data_spec = P(axis_name)

    def loss_fn(params, shard):
        def body(params, *shard_leaves):
            loss_sum, weight = model_apply(params, shard_leaves)
            loss_sum = jax.lax.psum(loss_sum, axis_name)
            weight = jax.lax.psum(weight, axis_name)
            return loss_sum / jnp.maximum(weight, 1.0)

        leaves, treedef = jax.tree_util.tree_flatten(shard)
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(),) + tuple(data_spec
                                               for _ in leaves),
                       out_specs=P())
        return fn(params, *leaves)

    @jax.jit
    def train_step(params, opt_state, shard):
        loss, grads = jax.value_and_grad(loss_fn)(params, shard)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
