"""Per-host partition directories + partition books.

Reference layout (``torch_geometric/distributed/partition.py:121``):

    root/META.json, root/node_map.pt, root/edge_map.pt,
    root/part_{i}/graph.pt, node_feats.pt, edge_feats.pt

TPU layout (npz, one dir per partition — each host loads ONLY its own):

    root/META.json             num_parts, num_nodes, n_max, e_max, h_max
    root/node_map.npy          global node id -> owning partition
    root/global_pos.npy        global node id -> gathered-buffer position
    root/part_{i}/graph.npz    device-step arrays (edge_src/dst/mask,
                               edge_src_halo, halo_send[_mask], weights)
    root/part_{i}/feats.npz    own (global ids), own_mask, x, y
    root/part_{i}/sample.npz   LOCAL sampling graph: nodes are
                               [own | halo] (halo = remote srcs of local
                               edges), with features for BOTH — the
                               static replication that replaces the
                               reference's per-batch RPC feature pull
                               (``dist_neighbor_sampler.py:875-947``).
"""

import json
import os
import os.path as osp
from typing import Dict, Optional

import numpy as np

from ..parallel.partition import GraphPartitions


def _sample_graph_arrays(parts: GraphPartitions, pid: int,
                         x: Optional[np.ndarray],
                         y: Optional[np.ndarray]) -> Dict[str, np.ndarray]:
    """Local-id sampling graph for one partition: local nodes are
    ``[own | halo]``; every edge whose dst is owned appears with src
    remapped into that space."""
    n_max = parts.n_max
    own_mask = parts.own_mask[pid]
    own = parts.own[pid][own_mask]                     # global ids
    emask = parts.edge_mask[pid]
    # edge_src is a gathered-buffer position part*n_max + local_pos
    src_buf = parts.edge_src[pid][emask]
    dst_loc = parts.edge_dst[pid][emask]
    src_part = src_buf // n_max
    src_lpos = src_buf % n_max
    src_global = parts.own[src_part, src_lpos]
    remote = src_part != pid
    halo_global = np.unique(src_global[remote])
    n_own = own.shape[0]
    n_id = np.concatenate([own, halo_global])
    # local position of every global id referenced here
    g2l = {}
    lookup = np.full(int(parts.node_part.shape[0]), -1, np.int64)
    lookup[own] = np.arange(n_own)
    lookup[halo_global] = n_own + np.arange(halo_global.shape[0])
    src_local = lookup[src_global]
    # dst is owned: its local position within `own` (own is ordered by
    # local_pos because own_mask is a prefix after partition packing)
    own_pos = np.full(n_max, -1, np.int64)
    own_pos[np.nonzero(own_mask)[0]] = np.arange(n_own)
    dst_local = own_pos[dst_loc]
    edge_index = np.stack([src_local, dst_local]).astype(np.int64)
    out = {'n_id': n_id, 'num_own': np.asarray(n_own),
           'edge_index': edge_index}
    del g2l
    if x is not None:
        out['x'] = x[n_id]
    if y is not None:
        out['y'] = y[own]
    return out


def save_partitions(parts: GraphPartitions, root: str,
                    x: Optional[np.ndarray] = None,
                    y: Optional[np.ndarray] = None,
                    hetero_meta: Optional[Dict] = None) -> None:
    """Write the partition dirs. ``x``/``y`` default to the stacked
    features already inside ``parts``. ``hetero_meta``: for partitioned
    HeteroData (reference ``partition.py`` hetero path) — dict with
    ``node_types``/``edge_types`` (type-name lists) and
    ``node_type``/``edge_type`` (global per-node/per-edge type ids),
    written as books next to ``node_map.npy``."""
    os.makedirs(root, exist_ok=True)
    P = parts.num_parts
    n = int(parts.node_part.shape[0])
    if x is None and parts.x is not None:
        x = np.zeros((n, parts.x.shape[-1]), parts.x.dtype)
        x[parts.own[parts.own_mask]] = parts.x[parts.own_mask]
    if y is None and parts.y is not None:
        y = np.zeros((n,), parts.y.dtype)
        y[parts.own[parts.own_mask]] = parts.y[parts.own_mask]

    meta = {
        'num_parts': P,
        'num_nodes': n,
        'n_max': parts.n_max,
        'e_max': int(parts.edge_src.shape[1]),
        'h_max': parts.h_max,
        'is_hetero': hetero_meta is not None,
        'node_types': (None if hetero_meta is None
                       else [list(t) if isinstance(t, (list, tuple))
                             else t for t in hetero_meta['node_types']]),
        'edge_types': (None if hetero_meta is None
                       else [list(t) for t in hetero_meta['edge_types']]),
    }
    with open(osp.join(root, 'META.json'), 'w') as f:
        json.dump(meta, f)
    np.save(osp.join(root, 'node_map.npy'), parts.node_part)
    np.save(osp.join(root, 'global_pos.npy'), parts.global_pos)
    if hetero_meta is not None:
        np.save(osp.join(root, 'node_type.npy'),
                np.asarray(hetero_meta['node_type']))
        np.save(osp.join(root, 'edge_type.npy'),
                np.asarray(hetero_meta['edge_type']))

    for pid in range(P):
        d = osp.join(root, f'part_{pid}')
        os.makedirs(d, exist_ok=True)
        graph = {
            'edge_src': parts.edge_src[pid],
            'edge_dst': parts.edge_dst[pid],
            'edge_mask': parts.edge_mask[pid],
        }
        if parts.edge_weight is not None:
            graph['edge_weight'] = parts.edge_weight[pid]
        if parts.halo_send is not None:
            graph['halo_send'] = parts.halo_send[pid]
            graph['halo_send_mask'] = parts.halo_send_mask[pid]
            graph['edge_src_halo'] = parts.edge_src_halo[pid]
        np.savez(osp.join(d, 'graph.npz'), **graph)
        feats = {'own': parts.own[pid], 'own_mask': parts.own_mask[pid]}
        if parts.x is not None:
            feats['x'] = parts.x[pid]
        if parts.y is not None:
            feats['y'] = parts.y[pid]
        np.savez(osp.join(d, 'feats.npz'), **feats)
        np.savez(osp.join(d, 'sample.npz'),
                 **_sample_graph_arrays(parts, pid, x, y))


def load_partition(root: str, pid: int) -> Dict[str, np.ndarray]:
    """Load ONE partition's arrays (what host ``pid`` feeds its devices).
    Returns a flat dict: graph.npz + feats.npz keys, and the sampling
    graph under ``sample_*`` keys."""
    d = osp.join(root, f'part_{pid}')
    out: Dict[str, np.ndarray] = {}
    for fname in ('graph.npz', 'feats.npz'):
        with np.load(osp.join(d, fname)) as z:
            out.update({k: z[k] for k in z.files})
    with np.load(osp.join(d, 'sample.npz')) as z:
        out.update({f'sample_{k}': z[k] for k in z.files})
    return out


def load_partition_books(root: str):
    """(META, node_map, global_pos) — the reference's ``node_map.pt``
    partition book (``partition.py:256``)."""
    with open(osp.join(root, 'META.json')) as f:
        meta = json.load(f)
    node_map = np.load(osp.join(root, 'node_map.npy'))
    global_pos = np.load(osp.join(root, 'global_pos.npy'))
    return meta, node_map, global_pos


def load_type_books(root: str):
    """(node_type, edge_type) global type-id vectors for hetero
    partitions (None, None when homogeneous)."""
    np_path = osp.join(root, 'node_type.npy')
    if not osp.exists(np_path):
        return None, None
    return (np.load(np_path), np.load(osp.join(root, 'edge_type.npy')))
