"""DataListLoader + DenseDataLoader (reference
``torch_geometric/loader/data_list_loader.py`` and
``dense_data_loader.py``)."""

from typing import List

import numpy as np


class DataListLoader:
    """Yields plain python lists of Data (no collation) — for models
    that scatter graphs themselves (reference ``data_list_loader.py``)."""

    def __init__(self, dataset, batch_size: int = 1,
                 shuffle: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) \
            // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = self.rng.permutation(order)
        for i in range(0, len(order), self.batch_size):
            yield [self.dataset[int(j)]
                   for j in order[i:i + self.batch_size]]


class DenseDataLoader:
    """Stacks same-sized dense graphs along a batch dim (reference
    ``dense_data_loader.py``): every attr becomes [B, ...]."""

    def __init__(self, dataset, batch_size: int = 1,
                 shuffle: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) \
            // self.batch_size

    def __iter__(self):
        import jax.numpy as jnp
        from ..data.data import Data
        order = np.arange(len(self.dataset))
        if self.shuffle:
            order = self.rng.permutation(order)
        for i in range(0, len(order), self.batch_size):
            graphs = [self.dataset[int(j)]
                      for j in order[i:i + self.batch_size]]
            keys = graphs[0].keys()
            stacked = {k: jnp.stack([jnp.asarray(np.asarray(
                g[k].coo if hasattr(g[k], 'coo') else g[k]))
                for g in graphs]) for k in keys}
            yield Data(num_nodes=graphs[0].num_nodes, **stacked)
