"""Heterogeneous NeighborLoader / HGTLoader (reference
``torch_geometric/loader/neighbor_loader.py`` hetero path and
``hgt_loader.py:11``)."""

from typing import Optional, Sequence, Tuple

import numpy as np

from ..data.hetero_data import HeteroData
from ..sampler.base import NodeSamplerInput
from ..sampler.hetero import HeteroNeighborSampler, HGTSampler


def _filter_hetero(data: HeteroData, out) -> HeteroData:
    """Per-type feature join (reference ``loader/utils.py:
    filter_hetero_data``)."""
    sub = HeteroData()
    for t in out.node.keys():
        nodes = out.node[t]
        mask = out.node_mask[t]
        safe = np.where(mask, nodes, 0)
        x = data[t].x
        if x is not None:
            xs = np.asarray(x)[safe]
            xs[~mask] = 0
            sub[t].x = xs
        y = data[t].y
        if y is not None:
            sub[t].y = np.asarray(y)[safe]
        sub[t].n_id = nodes
        sub[t].node_mask = mask
    for et in out.row.keys():
        coo = np.stack([out.row[et], out.col[et]])
        n_src = len(out.node[et[0]])
        coo = np.where(coo < 0, n_src, coo)
        sub[et].edge_index = coo.astype(np.int32)
        sub[et].e_id = out.edge[et]
        sub[et].edge_mask = out.edge_mask[et]
    sub[out.input_type].batch_size = np.asarray(out.batch_size)
    return sub


class HeteroNeighborLoader:
    """(reference ``neighbor_loader.py`` with (type, indices)
    input_nodes)."""

    def __init__(self, data: HeteroData, num_neighbors: Sequence[int],
                 input_nodes: Tuple[str, Optional[np.ndarray]],
                 batch_size: int = 1, shuffle: bool = False,
                 sampler_cls=HeteroNeighborSampler, seed: int = 0):
        self.data = data
        self.input_type, idx = input_nodes
        if idx is None:
            idx = np.arange(data[self.input_type].num_nodes)
        self.input_nodes = np.asarray(idx, np.int64)
        self.sampler = sampler_cls(data, num_neighbors, seed=seed)
        self.sampler.batch_size = batch_size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return (len(self.input_nodes) + self.batch_size - 1) \
            // self.batch_size

    def __iter__(self):
        order = (self.rng.permutation(len(self.input_nodes))
                 if self.shuffle else np.arange(len(self.input_nodes)))
        for i in range(0, len(order), self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size:
                idx = np.concatenate(
                    [idx, np.zeros(self.batch_size - len(idx),
                                   np.int64)])
            seeds = self.input_nodes[idx]
            out = self.sampler.sample_from_nodes(
                self.input_type, NodeSamplerInput(node=seeds))
            yield _filter_hetero(self.data, out)


class HGTLoader(HeteroNeighborLoader):
    """(reference ``hgt_loader.py:11``)."""

    def __init__(self, data, num_samples, input_nodes, **kw):
        super().__init__(data, num_samples, input_nodes,
                         sampler_cls=HGTSampler, **kw)
