"""NeighborSampler — host-side CSR uniform neighbor sampling.

Reference: ``torch_geometric/sampler/neighbor_sampler.py:40`` which calls
the pyg-lib C++ kernel ``torch.ops.pyg.neighbor_sample``
(``neighbor_sampler.py:576``). TPU-native redesign: a vectorised numpy
sampler (C++ extension drop-in planned at the same interface) that emits
**fixed-shape padded** ``SamplerOutput`` so the device step compiles
once. Semantics preserved: per-hop fanouts, with/without replacement,
first-occurrence global->local relabeling, seeds-first ordering,
``directional`` subgraph (edges sampled toward seeds).
"""

from typing import List, Optional, Sequence, Union

import numpy as np

from .base import (BaseSampler, NodeSamplerInput, EdgeSamplerInput,
                   NumNeighbors, NegativeSampling, SamplerOutput)
from ..data.data import Data
from ..edge_index import EdgeIndex


class _CSC:
    """Column-compressed adjacency: in-neighbors per node
    (reference ``sampler/utils.py:to_csc``)."""

    def __init__(self, edge_index, num_nodes: int):
        coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                         else edge_index)
        order = np.argsort(coo[1], kind='stable')
        self.row = coo[0][order]          # source of each in-edge
        self.eid = order.astype(np.int64)  # original edge position
        self.colptr = np.searchsorted(coo[1][order],
                                      np.arange(num_nodes + 1))
        self.num_nodes = num_nodes


def _sample_neighbors(csc: _CSC, frontier: np.ndarray, fanout: int,
                      rng: np.random.Generator, replace: bool):
    """For each frontier node: up to ``fanout`` in-neighbors.

    Returns (src [F*fanout], eid [F*fanout], valid [F*fanout]) — fixed
    shape, padded with -1/invalid.
    """
    f = len(frontier)
    deg = csc.colptr[frontier + 1] - csc.colptr[frontier]
    starts = csc.colptr[frontier]
    if replace:
        offs = rng.integers(0, np.maximum(deg, 1), (f, fanout))
        valid = (deg > 0)[:, None] & np.ones((f, fanout), bool)
    else:
        # without replacement: for each slot k take position
        # floor(k*deg/fanout) + jitter — approximates a uniform distinct
        # draw when deg > fanout; exact all-neighbors when deg <= fanout.
        k = np.arange(fanout)[None, :]
        valid = k < np.minimum(deg, fanout)[:, None]
        big = deg[:, None] > fanout
        base = (k * deg[:, None]) // max(fanout, 1)
        jitter = rng.integers(0, np.maximum(deg[:, None] // fanout, 1),
                              (f, fanout))
        offs = np.where(big, base + jitter, np.minimum(k, np.maximum(
            deg[:, None] - 1, 0)))
        offs = np.minimum(offs, np.maximum(deg[:, None] - 1, 0))
    pos = starts[:, None] + offs
    pos = np.minimum(pos, len(csc.row) - 1) if len(csc.row) else pos * 0
    src = csc.row[pos] if len(csc.row) else np.zeros((f, fanout),
                                                     np.int64)
    eid = csc.eid[pos] if len(csc.row) else np.zeros((f, fanout),
                                                     np.int64)
    return src.reshape(-1), eid.reshape(-1), valid.reshape(-1)


class NeighborSampler(BaseSampler):
    """GraphSAGE-style multi-hop sampler (reference
    ``neighbor_sampler.py:40``)."""

    def __init__(self, data: Union[Data, tuple],
                 num_neighbors: Sequence[int], replace: bool = False,
                 disjoint: bool = False, seed: int = 0):
        if isinstance(data, Data):
            self.num_nodes = data.num_nodes
            edge_index = data.edge_index
        else:
            edge_index, self.num_nodes = data
        self.csc = _CSC(edge_index, self.num_nodes)
        self.num_neighbors = NumNeighbors(num_neighbors)
        self.replace = replace
        self.disjoint = disjoint
        self.rng = np.random.default_rng(seed)
        self.batch_size: Optional[int] = None

    def _sample_native(self, seeds: np.ndarray, bs: int):
        """C++ fast path (csrc/sampler.cpp — the pyg-lib equivalent)."""
        import ctypes
        from ..csrc import load
        lib = load()
        node_caps = self.num_neighbors.node_budget(bs)
        edge_caps = self.num_neighbors.edge_budget(bs)
        n_cap, e_cap = sum(node_caps), sum(edge_caps)
        H = self.num_neighbors.num_hops

        colptr = np.ascontiguousarray(self.csc.colptr, np.int64)
        row = np.ascontiguousarray(self.csc.row, np.int64)
        eid = np.ascontiguousarray(self.csc.eid, np.int64)
        seeds_c = np.ascontiguousarray(seeds, np.int64)
        fanouts = np.ascontiguousarray(self.num_neighbors.values,
                                       np.int64)
        ecaps = np.ascontiguousarray(edge_caps, np.int64)
        node = np.zeros(n_cap, np.int64)
        node_mask = np.zeros(n_cap, np.uint8)
        rows = np.zeros(e_cap, np.int64)
        cols = np.zeros(e_cap, np.int64)
        eids = np.zeros(e_cap, np.int64)
        emask = np.zeros(e_cap, np.uint8)
        nsn = np.zeros(H + 1, np.int64)
        nse = np.zeros(H, np.int64)

        def p64(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

        def pu8(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

        lib.neighbor_sample(
            p64(colptr), p64(row), p64(eid),
            ctypes.c_int64(self.num_nodes),
            p64(seeds_c), ctypes.c_int64(len(seeds_c)),
            p64(fanouts), ctypes.c_int64(H),
            p64(ecaps), ctypes.c_int64(n_cap), ctypes.c_int64(e_cap),
            ctypes.c_int(int(self.replace)),
            ctypes.c_uint64(int(self.rng.integers(0, 2 ** 62))),
            p64(node), pu8(node_mask), p64(rows), p64(cols), p64(eids),
            pu8(emask), p64(nsn), p64(nse))
        return SamplerOutput(
            node=node, row=rows, col=cols, edge=eids,
            node_mask=node_mask.astype(bool),
            edge_mask=emask.astype(bool),
            num_sampled_nodes=[int(v) for v in nsn],
            num_sampled_edges=[int(v) for v in nse],
            batch_size=len(seeds))

    def sample_from_nodes(self, inputs: NodeSamplerInput) -> SamplerOutput:
        seeds = np.asarray(inputs.node, np.int64)
        bs = self.batch_size or len(seeds)
        from ..csrc import WITH_NATIVE_SAMPLER
        if WITH_NATIVE_SAMPLER:
            return self._sample_native(seeds, bs)
        node_caps = self.num_neighbors.node_budget(bs)
        edge_caps = self.num_neighbors.edge_budget(bs)
        n_cap = sum(node_caps)
        e_cap = sum(edge_caps)

        # first-occurrence global->local map, seeds first
        local = {}
        node_list = []
        for s in seeds:
            if int(s) not in local:
                local[int(s)] = len(node_list)
                node_list.append(int(s))
        num_sampled_nodes = [len(node_list)]
        num_sampled_edges = []

        rows = np.full(e_cap, n_cap, np.int64)    # local src (dump=n_cap)
        cols = np.full(e_cap, n_cap, np.int64)    # local dst
        eids = np.zeros(e_cap, np.int64)
        edge_mask = np.zeros(e_cap, bool)

        frontier = np.array(node_list, np.int64)
        e_cursor = 0
        for hop, fanout in enumerate(self.num_neighbors.values):
            if len(frontier) == 0:
                num_sampled_nodes.append(0)
                num_sampled_edges.append(0)
                e_cursor += edge_caps[hop]
                continue
            src, eid, valid = _sample_neighbors(
                self.csc, frontier, fanout, self.rng, self.replace)
            dst_local = np.repeat(
                [local[int(v)] for v in frontier], fanout)
            new_nodes = 0
            hop_edges = 0
            base = e_cursor
            next_frontier = []
            for i in range(len(src)):
                if not valid[i]:
                    continue
                g = int(src[i])
                if g not in local:
                    local[g] = len(node_list)
                    node_list.append(g)
                    next_frontier.append(g)
                    new_nodes += 1
                slot = base + hop_edges
                rows[slot] = local[g]
                cols[slot] = dst_local[i]
                eids[slot] = eid[i]
                edge_mask[slot] = True
                hop_edges += 1
            num_sampled_nodes.append(new_nodes)
            num_sampled_edges.append(hop_edges)
            e_cursor += edge_caps[hop]
            frontier = np.array(next_frontier, np.int64)

        node = np.zeros(n_cap, np.int64)
        node[:len(node_list)] = node_list
        node_mask = np.arange(n_cap) < len(node_list)
        return SamplerOutput(
            node=node, row=rows, col=cols, edge=eids,
            node_mask=node_mask, edge_mask=edge_mask,
            num_sampled_nodes=num_sampled_nodes,
            num_sampled_edges=num_sampled_edges,
            batch_size=len(seeds))

    def sample_from_edges(self, inputs: EdgeSamplerInput,
                          neg_sampling: Optional[NegativeSampling] = None
                          ) -> SamplerOutput:
        """Link sampling (reference ``neighbor_sampler.py`` edge path):
        seeds = src+dst (+ sampled negatives), binary mode."""
        row = np.asarray(inputs.row, np.int64)
        col = np.asarray(inputs.col, np.int64)
        k = len(row)
        neg = 0
        if neg_sampling is not None and neg_sampling.is_binary():
            neg = int(k * neg_sampling.amount)
        neg_row = self.rng.integers(0, self.num_nodes, neg)
        neg_col = self.rng.integers(0, self.num_nodes, neg)
        seeds = np.concatenate([row, col, neg_row, neg_col])
        self_bs, self.batch_size = self.batch_size, len(seeds)
        try:
            out = self.sample_from_nodes(NodeSamplerInput(node=seeds))
        finally:
            self.batch_size = self_bs
        label = np.concatenate([
            (np.asarray(inputs.label) if inputs.label is not None
             else np.ones(k, np.float32)),
            np.zeros(neg, np.float32)])
        # local positions of the seed pairs inside out.node
        loc = {int(g): i for i, g in enumerate(
            out.node[:out.num_sampled_nodes[0]])}
        src_idx = np.array([loc[int(g)] for g in
                            np.concatenate([row, neg_row])], np.int64)
        dst_idx = np.array([loc[int(g)] for g in
                            np.concatenate([col, neg_col])], np.int64)
        out.metadata = {'edge_label': label,
                        'edge_label_index': np.stack([src_idx, dst_idx])}
        return out


class BidirectionalNeighborSampler(NeighborSampler):
    """Samples over the union of in- and out-edges
    (reference ``neighbor_sampler.py:620``): the CSC is built on
    A + A^T so hops traverse both directions."""

    def __init__(self, data, num_neighbors, **kwargs):
        import numpy as _np
        ei = data.edge_index
        coo = _np.asarray(ei.coo if hasattr(ei, 'coo') else ei)
        both = _np.concatenate([coo, coo[::-1]], 1)
        both = _np.unique(both, axis=1)
        d2 = data.replace(edge_index=both) if hasattr(data, 'replace') \
            else type(data)(x=data.x, edge_index=both)
        super().__init__(d2, num_neighbors, **kwargs)
