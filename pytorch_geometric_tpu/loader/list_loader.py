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


class ZipLoader:
    """Zip several loaders into one iterator
    (reference ``loader/zip_loader.py``)."""

    def __init__(self, loaders, filter_per_worker: bool = False):
        self.loaders = list(loaders)

    def __len__(self):
        return min(len(ld) for ld in self.loaders)

    def __iter__(self):
        return zip(*self.loaders)


class AffinityMixin:
    """CPU-affinity context (reference ``loader/mixin.py:15``). JAX's
    dispatch is single-process host-side, so worker pinning is a no-op;
    kept for API parity."""

    def enable_cpu_affinity(self, loader_cores=None):
        import contextlib
        return contextlib.nullcontext()


class MultithreadingMixin:
    """(reference ``mixin.py:78``) — no-op under JAX dispatch."""

    def enable_multithreading(self, worker_threads: int = 1):
        import contextlib
        return contextlib.nullcontext()


class LogMemoryMixin:
    """(reference ``mixin.py:100``)."""

    def _mem_report(self):
        import resource
        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        print(f'peak host memory: {peak / 1024:.1f} MB')
