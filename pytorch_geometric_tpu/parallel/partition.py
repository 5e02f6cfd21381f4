"""Partitioner — offline graph partitioning for multi-chip training.

Reference: ``torch_geometric/distributed/partition.py:121``
(``Partitioner.generate_partition``) writes per-partition graph stores
with a global-dst halo plus node/edge partition books. TPU redesign: the
partitioner emits **statically padded per-part arrays** (stackable to
``[P, ...]`` and shardable over a ``graph`` mesh axis) instead of
per-host pickle files; the halo is addressed by *gathered-buffer
position* (part * n_max + local_pos) so the device-side exchange needs
no hashmap.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..data.data import Data
from ..edge_index import EdgeIndex
from ..loader.cluster import partition_graph


@dataclass
class GraphPartitions:
    """Stacked, padded partitions of one graph (all arrays leading dim P).

    own:        [P, n_max]  global node id owned by part p (padded 0)
    own_mask:   [P, n_max]
    x:          [P, n_max, F] owned node features
    y:          [P, n_max]  owned labels (optional)
    edge_src:   [P, e_max]  src position in the all-gathered buffer
                            (= part(src) * n_max + local_pos(src))
    edge_dst:   [P, e_max]  dst LOCAL position (< n_max)
    edge_mask:  [P, e_max]
    edge_weight:[P, e_max]  optional per-edge weights
    node_part:  [N]         partition book (reference node_map.pt)
    global_pos: [N]         position of each global node in the gathered
                            buffer
    """
    own: np.ndarray
    own_mask: np.ndarray
    x: Optional[np.ndarray]
    y: Optional[np.ndarray]
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_mask: np.ndarray
    edge_weight: Optional[np.ndarray]
    node_part: np.ndarray
    global_pos: np.ndarray
    # Sparse halo exchange (reference exchanges only boundary nodes per
    # hop, dist_neighbor_sampler.py:875-947; here the boundary sets are
    # precomputed so the device-side exchange is ONE all_to_all):
    # halo_send[p, r, s]   local position in p's own block to ship to r
    #                      (pad = n_max); halo_send[p, p] is all-pad.
    # edge_src_halo[p, e]  src position in p's [own | recv] buffer:
    #                      < n_max         -> own block
    #                      n_max + q*h + s -> slot s received from q
    halo_send: Optional[np.ndarray] = None
    halo_send_mask: Optional[np.ndarray] = None
    edge_src_halo: Optional[np.ndarray] = None
    # Hub replication (Partitioner(hub_frac=...) — power-law graphs):
    # the few highest-degree nodes are all-gathered every layer instead
    # of riding per-pair halo slots; remote hub-src edges address the
    # replicated block at n_max + P*h_max + owner*hub_max + slot.
    # hub_local[p, s] = local position in p's own block of its s-th hub.
    hub_local: Optional[np.ndarray] = None       # [P, hub_max]
    hub_local_mask: Optional[np.ndarray] = None  # [P, hub_max]
    hub_mask: Optional[np.ndarray] = None        # [N] global hub book
    # Hub-strategy edge arrays (hub_frac > 0 only): the halo edge list
    # minus hub-DST edges (addressed into [own | recv | hub_all]) ...
    edge_src_hub: Optional[np.ndarray] = None    # [P, eh_max]
    edge_dst_hub: Optional[np.ndarray] = None
    edge_mask_hub: Optional[np.ndarray] = None
    edge_weight_hub: Optional[np.ndarray] = None
    # ... and the hub-DST edges grouped by SRC part for merge-at-source
    # partial aggregation (one psum_scatter ships P partial rows per hub
    # instead of its whole in-neighborhood).
    agg_src: Optional[np.ndarray] = None         # [P, a_max] local src
    agg_slot: Optional[np.ndarray] = None        # [P, a_max] owner*hub_max+slot
    agg_mask: Optional[np.ndarray] = None
    agg_weight: Optional[np.ndarray] = None
    # Per-partition block-sparse LOCAL adjacency (ops/bsr_spmm.py;
    # generate_partition(local_bsr=True)): owned-src edges in
    # dense-enough 128x128 blocks run as MXU block matmuls; the
    # edge_* arrays then hold only halo + residual edges. Forward
    # (dst-major) and transpose (src-major) layouts, each padded to a
    # uniform block count so the stack shards over the mesh axis.
    bsr_vals: Optional[np.ndarray] = None     # [P, nb, BS, BS]
    bsr_rows: Optional[np.ndarray] = None     # [P, nb]
    bsr_cols: Optional[np.ndarray] = None     # [P, nb]
    bsr_first: Optional[np.ndarray] = None    # [P, nb]
    bsr_t_vals: Optional[np.ndarray] = None
    bsr_t_rows: Optional[np.ndarray] = None
    bsr_t_cols: Optional[np.ndarray] = None
    bsr_t_first: Optional[np.ndarray] = None

    @property
    def num_parts(self) -> int:
        return self.own.shape[0]

    @property
    def n_max(self) -> int:
        return self.own.shape[1]

    @property
    def h_max(self) -> int:
        return 0 if self.halo_send is None else self.halo_send.shape[2]

    def halo_bytes(self, feature_dim: int, itemsize: int = 4) -> int:
        """Boundary features actually shipped per layer (all devices),
        including the replicated hub rows when hub replication is on."""
        if self.halo_send_mask is None:
            return 0
        b = int(self.halo_send_mask.sum()) * feature_dim * itemsize
        if self.hub_local_mask is not None:
            P = self.num_parts
            # all_gather of owned hub rows
            b += (P - 1) * int(self.hub_local_mask.sum()) \
                * feature_dim * itemsize
            if self.agg_slot is not None:
                # psum_scatter of per-part hub partials (padded slots —
                # the collective ships the whole [P, hub_max, F] buffer)
                b += P * (P - 1) * self.hub_local.shape[1] \
                    * feature_dim * itemsize
        return b

    def gather_bytes(self, feature_dim: int, itemsize: int = 4) -> int:
        """What the dense all_gather baseline ships per layer."""
        P = self.num_parts
        return P * (P - 1) * self.n_max * feature_dim * itemsize


class Partitioner:
    """(reference ``distributed/partition.py:18``)."""

    def __init__(self, data: Data, num_parts: int, seed: int = 0,
                 hub_frac: float = 0.0):
        """``hub_frac > 0`` enables hub replication: the top fraction of
        nodes by degree are all-gathered every layer instead of halo-
        exchanged — the standard fix for power-law graphs where edge-cut
        partitioning stalls (use ``partition_spmm_hub``)."""
        self.data = data
        self.num_parts = num_parts
        self.seed = seed
        self.hub_frac = hub_frac

    def generate_partition(self, local_bsr: bool = False
                           ) -> GraphPartitions:
        data = self.data
        P = self.num_parts
        n = data.num_nodes
        coo = np.asarray(data.edge_index.coo
                         if isinstance(data.edge_index, EdgeIndex)
                         else data.edge_index)
        hub_mask = None
        if self.hub_frac > 0:
            from ..loader.cluster import partition_graph_hubs
            parts, hub_mask = partition_graph_hubs(
                coo, n, P, hub_frac=self.hub_frac, seed=self.seed)
        else:
            parts = partition_graph(coo, n, P, seed=self.seed)

        counts = np.bincount(parts, minlength=P).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)])
        order = np.argsort(parts, kind='stable')
        local_pos = np.zeros(n, np.int64)
        local_pos[order] = np.arange(n) - starts[parts[order]]
        n_max = int(counts.max())
        global_pos = parts.astype(np.int64) * n_max + local_pos

        own = np.zeros((P, n_max), np.int64)
        own_mask = np.zeros((P, n_max), bool)
        own[parts, local_pos] = np.arange(n)
        own_mask[parts, local_pos] = True

        x = None
        if data.x is not None:
            xf = np.asarray(data.x)
            x = np.zeros((P, n_max, xf.shape[1]), xf.dtype)
            x[parts, local_pos] = xf
        y = None
        if data.y is not None:
            yf = np.asarray(data.y).reshape(-1)
            if yf.shape[0] == n:
                y = np.zeros((P, n_max), yf.dtype)
                y[parts, local_pos] = yf

        # ---- per-partition local BSR (optional) --------------------------
        # Owned-src edges in dense-enough 128x128 blocks are pulled out
        # of the edge list and materialised as MXU blocks; the edge
        # arrays below then carry only halo + residual edges.
        bsr_fields = {}
        keep = None
        if local_bsr:
            from ..ops.bsr_spmm import BS, block_fill_mask, build_bsr
            e_all0 = coo.shape[1]
            w_all = (np.asarray(data.edge_weight)
                     if data.edge_weight is not None
                     else np.ones(e_all0, np.float32))
            dst_part = parts[coo[1]]
            local_edge = parts[coo[0]] == dst_part
            keep = np.ones(e_all0, bool)
            fwd_list, bwd_list = [], []
            for p in range(P):
                sel = np.where(local_edge & (dst_part == p))[0]
                coo_loc = np.stack([local_pos[coo[0][sel]],
                                    local_pos[coo[1][sel]]])
                inb = (block_fill_mask(coo_loc, n_max, n_max)
                       if len(sel) else np.zeros(0, bool))
                keep[sel[inb]] = False
                cb, wb = coo_loc[:, inb], w_all[sel][inb]
                fwd_list.append(build_bsr(cb, wb, n_max, n_max))
                bwd_list.append(build_bsr(cb[::-1], wb, n_max, n_max))

            def _stack(blks):
                d_blocks = max((n_max + BS - 1) // BS, 1)
                nb_max = max(int(b.vals.shape[0]) for b in blks)
                vals = np.zeros((P, nb_max, BS, BS), np.float32)
                rows = np.full((P, nb_max), d_blocks - 1, np.int32)
                cols = np.zeros((P, nb_max), np.int32)
                first = np.zeros((P, nb_max), np.int32)
                for p, b in enumerate(blks):
                    k = int(b.vals.shape[0])
                    vals[p, :k] = np.asarray(b.vals)
                    rows[p, :k] = np.asarray(b.rows)
                    cols[p, :k] = np.asarray(b.cols)
                    first[p, :k] = np.asarray(b.first)
                return vals, rows, cols, first

            (bsr_fields['bsr_vals'], bsr_fields['bsr_rows'],
             bsr_fields['bsr_cols'],
             bsr_fields['bsr_first']) = _stack(fwd_list)
            (bsr_fields['bsr_t_vals'], bsr_fields['bsr_t_rows'],
             bsr_fields['bsr_t_cols'],
             bsr_fields['bsr_t_first']) = _stack(bwd_list)
            coo = coo[:, keep]

        # edges assigned to the owner of their DESTINATION (CSC layout,
        # like the reference's dst-partitioned graph.pt)
        eparts = parts[coo[1]]
        e_counts = np.bincount(eparts, minlength=P)
        e_max = int(e_counts.max()) if len(e_counts) else 1
        edge_src = np.zeros((P, e_max), np.int64)
        edge_dst = np.full((P, e_max), n_max, np.int64)
        edge_mask = np.zeros((P, e_max), bool)
        ew = None
        w = data.edge_weight
        if w is not None:
            w = np.asarray(w)
            if keep is not None:
                w = w[keep]
            ew = np.zeros((P, e_max), w.dtype)
        e_starts = np.concatenate([[0], np.cumsum(e_counts)])
        eorder = np.argsort(eparts, kind='stable')
        e_pos = np.arange(coo.shape[1]) - e_starts[eparts[eorder]]
        ep_s = eparts[eorder]
        edge_src[ep_s, e_pos] = global_pos[coo[0][eorder]]
        edge_dst[ep_s, e_pos] = local_pos[coo[1][eorder]]
        edge_mask[ep_s, e_pos] = True
        if ew is not None:
            ew[ep_s, e_pos] = w[eorder]

        # ---- hub replication block ---------------------------------------
        # Hub rows are all-gathered every layer (one [P, hub_max, F]
        # collective), so hub-src edges never enter the per-pair halo
        # sets — the padding blowup hubs cause there is the whole
        # problem on power-law graphs.
        hub_local = hub_local_mask = None
        hub_slot = None
        hub_max = 0
        src_part = parts[coo[0]]
        if hub_mask is not None:
            hub_ids = np.nonzero(hub_mask)[0]
            hub_owner = parts[hub_ids]
            h_counts = np.bincount(hub_owner, minlength=P)
            hub_max = max(8, -(-int(h_counts.max()) // 8) * 8)
            h_starts = np.concatenate([[0], np.cumsum(h_counts)])
            horder = np.argsort(hub_owner, kind='stable')
            h_pos = np.arange(len(hub_ids)) - h_starts[
                hub_owner[horder]]
            hub_slot = np.zeros(n, np.int64)
            hub_slot[hub_ids[horder]] = h_pos
            hub_local = np.full((P, hub_max), n_max, np.int64)
            hub_local_mask = np.zeros((P, hub_max), bool)
            hub_local[hub_owner[horder], h_pos] = local_pos[
                hub_ids[horder]]
            hub_local_mask[hub_owner[horder], h_pos] = True

        # ---- sparse halo sets --------------------------------------------
        # For every (src-part q, dst-part p) pair, the unique boundary
        # nodes q must ship to p. Slot order is sorted-by-global-id, so
        # sender and receiver agree on addressing with no handshake.
        # With hub replication, hub-DST edges leave this strategy
        # entirely (they ride the partial-aggregation psum_scatter) and
        # hub-SRC edges read the replicated block — both directions of a
        # hub's edge mass stay off the per-pair halo slots.
        w_all = (w if w is not None
                 else np.ones(coo.shape[1], np.float32))
        if hub_mask is not None:
            hub_dst_m = hub_mask[coo[1]]
            hsel = np.nonzero(~hub_dst_m)[0]
        else:
            hub_dst_m = None
            hsel = np.arange(coo.shape[1])
        hcoo = coo[:, hsel]
        h_eparts = eparts[hsel]
        h_src_part = src_part[hsel]
        hub_src = (hub_mask[hcoo[0]] if hub_mask is not None
                   else np.zeros(hcoo.shape[1], bool))
        rem_all = h_src_part != h_eparts
        rem = rem_all & ~hub_src
        if rem.any():
            pairkey = h_src_part[rem].astype(np.int64) * P \
                + h_eparts[rem]
            combined = pairkey * (n + 1) + hcoo[0][rem]
            uniq = np.unique(combined)
            u_pair = uniq // (n + 1)
            u_src = (uniq % (n + 1)).astype(np.int64)
            pair_counts = np.bincount(u_pair, minlength=P * P)
            h_max = int(pair_counts.max())
            h_max = max(8, -(-h_max // 8) * 8)      # pad to lanes of 8
            pair_offsets = np.concatenate([[0], np.cumsum(pair_counts)])
            slot = np.arange(len(uniq)) - pair_offsets[u_pair]
        else:
            uniq = np.zeros(0, np.int64)
            u_pair = np.zeros(0, np.int64)
            u_src = np.zeros(0, np.int64)
            slot = np.zeros(0, np.int64)
            h_max = 8
        halo_send = np.full((P, P, h_max), n_max, np.int64)
        halo_send_mask = np.zeros((P, P, h_max), bool)
        q_of = u_pair // P
        p_of = u_pair % P
        halo_send[q_of, p_of, slot] = local_pos[u_src]
        halo_send_mask[q_of, p_of, slot] = True

        # Re-address each halo-strategy edge's src into the receiver's
        # [own | recv | hub_all] buffer: own-block position for local
        # edges, halo-slot position for remote ones, replicated-block
        # position for remote hub sources.
        buf_pos = np.zeros(len(hsel), np.int64)
        local_e = ~rem_all
        buf_pos[local_e] = local_pos[hcoo[0][local_e]]
        if rem.any():
            pairkey_e = (h_src_part[rem].astype(np.int64) * P
                         + h_eparts[rem])
            comb_e = pairkey_e * (n + 1) + hcoo[0][rem]
            u_idx = np.searchsorted(uniq, comb_e)
            buf_pos[rem] = (n_max + u_pair[u_idx] // P * h_max
                            + slot[u_idx])
        rem_hub = rem_all & hub_src
        if rem_hub.any():
            buf_pos[rem_hub] = (n_max + P * h_max
                                + h_src_part[rem_hub] * hub_max
                                + hub_slot[hcoo[0][rem_hub]])
        # pad slots point one past the full buffer (masked out on device)
        buf_end = n_max + P * h_max + P * hub_max

        hub_fields = {}
        if hub_mask is None:
            # halo-strategy edges == dense-gather edges: reuse alignment
            edge_src_halo = np.full((P, e_max), buf_end, np.int64)
            edge_src_halo[ep_s, e_pos] = buf_pos[eorder]
        else:
            edge_src_halo = None
            # separate padded edge arrays for the hub strategy
            eh_counts = np.bincount(h_eparts, minlength=P)
            eh_max = max(8, -(-int(eh_counts.max()) // 8) * 8)
            e_src_h = np.full((P, eh_max), buf_end, np.int64)
            e_dst_h = np.full((P, eh_max), n_max, np.int64)
            e_msk_h = np.zeros((P, eh_max), bool)
            e_w_h = np.zeros((P, eh_max), np.float32)
            eh_starts = np.concatenate([[0], np.cumsum(eh_counts)])
            ho = np.argsort(h_eparts, kind='stable')
            h_pos_e = np.arange(len(hsel)) - eh_starts[h_eparts[ho]]
            e_src_h[h_eparts[ho], h_pos_e] = buf_pos[ho]
            e_dst_h[h_eparts[ho], h_pos_e] = local_pos[hcoo[1][ho]]
            e_msk_h[h_eparts[ho], h_pos_e] = True
            e_w_h[h_eparts[ho], h_pos_e] = w_all[hsel][ho]
            # hub-DST edges: merged at the SOURCE part (each part
            # aggregates its local contributions per hub, then ONE
            # psum_scatter ships P rows per hub instead of its whole
            # in-neighborhood)
            aggsel = np.nonzero(hub_dst_m)[0]
            ap = parts[coo[0][aggsel]]
            a_counts = np.bincount(ap, minlength=P)
            a_max = max(8, -(-int(max(a_counts.max(), 1)) // 8) * 8)
            agg_src = np.full((P, a_max), n_max, np.int64)
            agg_slot = np.full((P, a_max), P * hub_max, np.int64)
            agg_mask = np.zeros((P, a_max), bool)
            agg_w = np.zeros((P, a_max), np.float32)
            a_starts = np.concatenate([[0], np.cumsum(a_counts)])
            ao = np.argsort(ap, kind='stable')
            a_pos = np.arange(len(aggsel)) - a_starts[ap[ao]]
            sel_o = aggsel[ao]
            agg_src[ap[ao], a_pos] = local_pos[coo[0][sel_o]]
            agg_slot[ap[ao], a_pos] = (parts[coo[1][sel_o]].astype(
                np.int64) * hub_max + hub_slot[coo[1][sel_o]])
            agg_mask[ap[ao], a_pos] = True
            agg_w[ap[ao], a_pos] = w_all[sel_o]
            hub_fields = dict(edge_src_hub=e_src_h, edge_dst_hub=e_dst_h,
                              edge_mask_hub=e_msk_h,
                              edge_weight_hub=e_w_h, agg_src=agg_src,
                              agg_slot=agg_slot, agg_mask=agg_mask,
                              agg_weight=agg_w)

        return GraphPartitions(own=own, own_mask=own_mask, x=x, y=y,
                               edge_src=edge_src, edge_dst=edge_dst,
                               edge_mask=edge_mask, edge_weight=ew,
                               node_part=parts, global_pos=global_pos,
                               halo_send=halo_send,
                               halo_send_mask=halo_send_mask,
                               edge_src_halo=edge_src_halo,
                               hub_local=hub_local,
                               hub_local_mask=hub_local_mask,
                               hub_mask=hub_mask,
                               **hub_fields, **bsr_fields)
