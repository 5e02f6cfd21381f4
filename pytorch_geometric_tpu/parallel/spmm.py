"""Partition-parallel message passing over a device mesh.

The TPU replacement for the reference's pull-based RPC sampling + halo
merge (``distributed/dist_neighbor_sampler.py:875-947``): graph
partitions live on devices along a ``graph`` mesh axis.

Two exchange strategies:

* **sparse halo** (default, :func:`partition_spmm_halo`) — the
  Partitioner precomputes per-pair boundary index sets; each layer ships
  ONLY boundary features via one ``all_to_all`` over ICI
  (O(boundary * F) traffic), then reduces local edges against the
  ``[own | recv]`` buffer. The backward is the transposed
  ``all_to_all`` — the mirrored halo-gradient exchange — for free via
  shard_map differentiation.
* **dense gather** (:func:`partition_spmm`) — all-gathers every owned
  block (O(N * F) replicated traffic); kept as the fallback for
  partitions built without halo sets.

The boundary ``x_own[halo_send]`` gather and the local-edge aggregation
are independent of the collective's in-flight bytes, so XLA's async
collectives overlap them with compute where profitable.
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


def _halo_exchange(x_own: jnp.ndarray, halo_send: jnp.ndarray,
                   halo_send_mask: jnp.ndarray,
                   axis_name: str) -> jnp.ndarray:
    """Sparse boundary exchange shared by the halo SpMM and attention
    paths: gather this device's boundary rows (pad -> zero row), ONE
    ``all_to_all`` (device q's send[r] lands as this device's recv[q];
    slot order was agreed at partition time), return the addressable
    ``[own | recv | zero]`` buffer."""
    n_max, f = x_own.shape
    num_p, h_max = halo_send.shape
    x_pad = jnp.concatenate([x_own, jnp.zeros((1, f), x_own.dtype)])
    send = x_pad[jnp.minimum(halo_send, n_max)]          # [P, h, F]
    send = jnp.where(halo_send_mask[..., None], send, 0)
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)  # [P, h, F]
    return jnp.concatenate([x_own, recv.reshape(num_p * h_max, f),
                            jnp.zeros((1, f), x_own.dtype)])


def partition_spmm_halo(x_own: jnp.ndarray, halo_send: jnp.ndarray,
                        halo_send_mask: jnp.ndarray,
                        edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
                        edge_mask: jnp.ndarray,
                        edge_weight: Optional[jnp.ndarray],
                        axis_name: str = 'graph') -> jnp.ndarray:
    """Sparse-halo A^T x (dst-owned). Call INSIDE shard_map.

    x_own:          [n_max, F] this device's owned features
    halo_send:      [P, h_max] local positions to ship to each peer
    halo_send_mask: [P, h_max]
    edge_src:       [e_max] position in the [own | recv] buffer
    edge_dst:       [e_max] local dst position
    """
    n_max = x_own.shape[0]
    buf = _halo_exchange(x_own, halo_send, halo_send_mask, axis_name)
    src = jnp.minimum(edge_src, buf.shape[0] - 1)
    msg = buf[src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    dst = jnp.where(edge_mask, edge_dst, n_max)
    return jax.ops.segment_sum(msg, dst, n_max + 1)[:n_max]


def partition_gat_attention(x_own: jnp.ndarray,
                            halo_send: jnp.ndarray,
                            halo_send_mask: jnp.ndarray,
                            edge_src: jnp.ndarray,
                            edge_dst: jnp.ndarray,
                            edge_mask: jnp.ndarray,
                            att_src: jnp.ndarray,
                            att_dst: jnp.ndarray,
                            negative_slope: float = 0.2,
                            axis_name: str = 'graph') -> jnp.ndarray:
    """Partition-parallel GAT attention aggregation (dst-owned edges).
    Call INSIDE shard_map.

    The union edge softmax needs NO cross-device reduction: edges are
    dst-partitioned (the Partitioner invariant — every destination's
    ENTIRE in-neighborhood lives with its owner), so the segment
    softmax is device-local; only SOURCE features cross the mesh, via
    the same one-collective sparse halo as :func:`partition_spmm_halo`.
    The source logit halves are recomputed from the received rows
    (``att_src`` is replicated), so the wire carries just [h_max, H*C]
    per peer. This is the graph analog of sequence-parallel attention
    (SURVEY §5): softmax-dimension locality by partitioning.

    x_own: [n_max, H, C] projected features; att_src/att_dst: [H, C].
    Returns [n_max, H, C].
    """
    n_max, h, c = x_own.shape
    f = h * c
    flat = x_own.reshape(n_max, f)
    buf = _halo_exchange(flat, halo_send, halo_send_mask, axis_name)
    a_src_buf = (buf.reshape(-1, h, c) * att_src).sum(-1)   # [B, H]
    a_dst = (x_own * att_dst).sum(-1)                       # [n_max, H]
    src = jnp.minimum(edge_src, buf.shape[0] - 1)
    dsafe = jnp.minimum(edge_dst, n_max - 1)
    base = a_src_buf[src] + a_dst[dsafe]
    logit = jnp.where(base >= 0, base, negative_slope * base)
    from ..ops.softmax import softmax as segment_softmax
    alpha = segment_softmax(logit, dsafe, n_max, mask=edge_mask)
    msg = buf[src].reshape(-1, h, c) * alpha[:, :, None]
    msg = jnp.where(edge_mask[:, None, None], msg, 0)
    dst = jnp.where(edge_mask, edge_dst, n_max)
    out = jax.ops.segment_sum(msg.reshape(-1, f), dst, n_max + 1)
    return out[:n_max].reshape(n_max, h, c)


def partition_spmm_hub(x_own: jnp.ndarray, halo_send: jnp.ndarray,
                       halo_send_mask: jnp.ndarray,
                       hub_local: jnp.ndarray,
                       hub_local_mask: jnp.ndarray,
                       edge_src: jnp.ndarray, edge_dst: jnp.ndarray,
                       edge_mask: jnp.ndarray,
                       edge_weight: Optional[jnp.ndarray],
                       agg_src: jnp.ndarray, agg_slot: jnp.ndarray,
                       agg_mask: jnp.ndarray,
                       agg_weight: Optional[jnp.ndarray],
                       axis_name: str = 'graph') -> jnp.ndarray:
    """Hub-replicated A^T x — the power-law strategy
    (``Partitioner(hub_frac=...)``). Call INSIDE shard_map.

    Both directions of a hub's edge mass stay off the per-pair halo
    slots:

    * hub SOURCES are all-gathered once per layer (one ``[hub_max, F]``
      block per device), so their out-edges read the replicated block;
    * hub DESTINATIONS receive merged-at-source partials: each device
      segment-sums its local contributions per hub and ONE
      ``psum_scatter`` delivers each owner its hubs' totals — P rows
      per hub over the wire instead of the hub's whole in-neighborhood.

    The residual boundary rides the usual one-collective ``all_to_all``.
    Backward: shard_map differentiation gives the mirrored collectives
    (all_gather <-> psum_scatter are transposes of each other).

    hub_local: [hub_max] local positions of this device's hubs
    edge_src:  [eh_max]  position in the [own | recv | hub_all] buffer
               (``parts.edge_src_hub`` — hub-dst edges excluded)
    agg_src:   [a_max]   local src positions of hub-dst edges
    agg_slot:  [a_max]   owner * hub_max + owner-local hub slot
    """
    n_max, f = x_own.shape
    num_p, h_max = halo_send.shape
    hub_max = hub_local.shape[0]
    x_pad = jnp.concatenate([x_own, jnp.zeros((1, f), x_own.dtype)])
    send = x_pad[jnp.minimum(halo_send, n_max)]
    send = jnp.where(halo_send_mask[..., None], send, 0)
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    hub_rows = x_pad[jnp.minimum(hub_local, n_max)]
    hub_rows = jnp.where(hub_local_mask[:, None], hub_rows, 0)
    hub_all = jax.lax.all_gather(hub_rows, axis_name,
                                 tiled=True)           # [P*hub_max, F]
    buf = jnp.concatenate([x_own, recv.reshape(num_p * h_max, f),
                           hub_all, jnp.zeros((1, f), x_own.dtype)])
    src = jnp.minimum(edge_src, buf.shape[0] - 1)
    msg = buf[src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    dst = jnp.where(edge_mask, edge_dst, n_max)
    out = jax.ops.segment_sum(msg, dst, n_max + 1)[:n_max]

    # hub-dst edges: local partials per global hub slot, reduced and
    # scattered to owners in one collective
    amsg = x_pad[jnp.minimum(agg_src, n_max)]
    if agg_weight is not None:
        amsg = amsg * agg_weight[:, None]
    aslot = jnp.where(agg_mask, agg_slot, num_p * hub_max)
    partial = jax.ops.segment_sum(
        amsg, aslot, num_p * hub_max + 1)[:num_p * hub_max]
    mine = jax.lax.psum_scatter(partial, axis_name,
                                scatter_dimension=0,
                                tiled=True)            # [hub_max, F]
    idx = jnp.where(hub_local_mask, hub_local, n_max)
    hub_add = jnp.zeros((n_max + 1, f), x_own.dtype).at[idx].add(
        jnp.where(hub_local_mask[:, None], mine, 0))
    return out + hub_add[:n_max]


def partition_spmm_halo_bsr(x_own: jnp.ndarray, halo_send: jnp.ndarray,
                            halo_send_mask: jnp.ndarray,
                            bsr_leaves, edge_src: jnp.ndarray,
                            edge_dst: jnp.ndarray,
                            edge_mask: jnp.ndarray,
                            edge_weight: Optional[jnp.ndarray],
                            axis_name: str = 'graph') -> jnp.ndarray:
    """Sparse-halo A^T x with the LOCAL dense-block edges on the BSR
    MXU kernel (``ops/bsr_spmm.py``). Call INSIDE shard_map.

    bsr_leaves: (vals, rows, cols, first, t_vals, t_rows, t_cols,
    t_first) — this partition's local block adjacency + transpose
    (``Partitioner.generate_partition(local_bsr=True)``). ``edge_src``/
    ``edge_dst`` carry only the halo + residual edges.
    """
    from ..ops.bsr_spmm import BSR, bsr_spmm
    n_max = x_own.shape[0]
    (vals, rows, cols, first, t_vals, t_rows, t_cols,
     t_first) = bsr_leaves
    fwd = BSR(vals=vals, rows=rows, cols=cols, first=first)
    bwd = BSR(vals=t_vals, rows=t_rows, cols=t_cols, first=t_first)
    local = bsr_spmm(fwd, bwd, x_own, n_max, n_max,
                     vma=frozenset({axis_name}))
    tail = partition_spmm_halo(x_own, halo_send, halo_send_mask,
                               edge_src, edge_dst, edge_mask,
                               edge_weight, axis_name)
    return local + tail


def build_ring_buckets(parts):
    """Host-side: regroup each partition's edges by SOURCE partition for
    the ring schedule (derived from the existing partition books:
    ``edge_src // n_max`` is the source partition, ``% n_max`` its local
    position). Returns [P, P, e_pp] arrays (ring_src local-in-q,
    ring_dst local-in-p, ring_mask, ring_w or None)."""
    import numpy as np
    P, n_max = parts.num_parts, parts.n_max
    src_q = np.asarray(parts.edge_src) // n_max          # [P, e_max]
    src_local = np.asarray(parts.edge_src) % n_max
    dst_local = np.asarray(parts.edge_dst)
    mask = np.asarray(parts.edge_mask)
    w = (np.asarray(parts.edge_weight)
         if parts.edge_weight is not None else None)
    counts = np.zeros((P, P), np.int64)
    for p in range(P):
        m = mask[p]
        counts[p] = np.bincount(src_q[p][m], minlength=P)
    e_pp = max(8, -(-int(counts.max()) // 8) * 8)
    ring_src = np.full((P, P, e_pp), n_max, np.int64)
    ring_dst = np.full((P, P, e_pp), n_max, np.int64)
    ring_mask = np.zeros((P, P, e_pp), bool)
    ring_w = (np.zeros((P, P, e_pp), w.dtype)
              if w is not None else None)
    for p in range(P):
        m = mask[p]
        qs = src_q[p][m]
        order = np.argsort(qs, kind='stable')
        offs = np.concatenate([[0], np.cumsum(counts[p])])
        pos = np.arange(len(qs)) - offs[qs[order]]
        ring_src[p, qs[order], pos] = src_local[p][m][order]
        ring_dst[p, qs[order], pos] = dst_local[p][m][order]
        ring_mask[p, qs[order], pos] = True
        if ring_w is not None:
            ring_w[p, qs[order], pos] = w[p][m][order]
    return ring_src, ring_dst, ring_mask, ring_w


def partition_spmm_ring(x_own: jnp.ndarray, ring_src: jnp.ndarray,
                        ring_dst: jnp.ndarray, ring_mask: jnp.ndarray,
                        ring_w: Optional[jnp.ndarray],
                        axis_name: str = 'graph') -> jnp.ndarray:
    """Ring-pipelined A^T x — the graph analog of ring attention
    (SURVEY §5). Call INSIDE shard_map.

    Instead of one bulk exchange, each device's feature block rotates
    around the ring (``ppermute``); at step s every device aggregates
    the edges whose sources live in the block it currently holds, so
    every hop's transfer overlaps the previous hop's segment-sum.
    Traffic is O(P * n_max * F) like all_gather, but peak memory is one
    block (O(n_max * F)) instead of the gathered O(P * n_max * F), and
    compute/communication overlap is explicit in the schedule rather
    than left to XLA. Prefer the sparse halo exchange
    (:func:`partition_spmm_halo`) when boundaries are small; the ring
    wins when nearly everything is boundary (high edge-cut) or when the
    gathered buffer does not fit.

    ring_src: [P, e_pp] this device's edges grouped by SOURCE partition
              q (slot = position local to q's block; pad = n_max)
    ring_dst: [P, e_pp] local dst positions
    Backward (reverse-mode through scan + ppermute) is the reverse
    ring — also pipelined.
    """
    n_max, f = x_own.shape
    num_p = ring_src.shape[0]
    me = jax.lax.axis_index(axis_name)
    fwd_ring = [(i, (i + 1) % num_p) for i in range(num_p)]

    def step(carry, s):
        out, blk = carry
        q = (me - s) % num_p           # whose block we hold at step s
        src = jax.lax.dynamic_index_in_dim(ring_src, q, 0, False)
        dst = jax.lax.dynamic_index_in_dim(ring_dst, q, 0, False)
        msk = jax.lax.dynamic_index_in_dim(ring_mask, q, 0, False)
        msg = blk[jnp.minimum(src, n_max - 1)]
        if ring_w is not None:
            wq = jax.lax.dynamic_index_in_dim(ring_w, q, 0, False)
            msg = msg * wq[:, None]
        msg = jnp.where(msk[:, None], msg, 0)
        d = jnp.where(msk, dst, n_max)
        out = out + jax.ops.segment_sum(msg, d, n_max + 1)[:n_max]
        blk = jax.lax.ppermute(blk, axis_name, fwd_ring)
        return (out, blk), None

    out0 = jnp.zeros_like(x_own)
    (out, _), _ = jax.lax.scan(step, (out0, x_own),
                               jnp.arange(num_p))
    return out


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
        # check_vma=False: Pallas interpret mode (CPU tests/dryrun)
        # cannot propagate varying-axis metadata through its
        # dynamic_slice lowering (jax suggests this workaround).
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(),) + tuple(data_spec
                                               for _ in leaves),
                       out_specs=P(), check_vma=False)
        return fn(params, *leaves)

    @jax.jit
    def train_step(params, opt_state, shard):
        loss, grads = jax.value_and_grad(loss_fn)(params, shard)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
