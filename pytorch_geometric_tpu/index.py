"""Index + HashTensor — the remaining L1 runtime containers.

Reference: ``torch_geometric/index.py:88`` (1-D index tensor carrying
``dim_size``/``is_sorted`` with a cached ``indptr``) and
``hash_tensor.py:89`` (O(1) global->local id mapping backed by
pyg-lib CPU/CUDA hash maps). TPU redesign: ``Index`` is a small pytree;
``HashTensor`` uses a dense lookup table when the key range is bounded
(device-friendly gather) and a numpy dict fallback otherwise.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Index:
    """(reference ``index.py:88``)."""

    def __init__(self, data, dim_size: Optional[int] = None,
                 is_sorted: bool = False,
                 indptr: Optional[jnp.ndarray] = None):
        self.data = jnp.asarray(data)
        self.dim_size = (int(dim_size) if dim_size is not None
                         else (int(self.data.max()) + 1
                               if self.data.size else 0))
        self.is_sorted = bool(is_sorted)
        self.indptr = indptr

    def tree_flatten(self):
        return (self.data, self.indptr), (self.dim_size, self.is_sorted)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data, obj.indptr = children
        obj.dim_size, obj.is_sorted = aux
        return obj

    def get_indptr(self) -> jnp.ndarray:
        """CSR pointer (requires sorted data; reference
        ``index.py:get_indptr``)."""
        if self.indptr is not None:
            return self.indptr
        from .ops.segment import index2ptr
        return index2ptr(self.data, self.dim_size)

    def fill_cache(self) -> 'Index':
        return Index(self.data, self.dim_size, self.is_sorted,
                     indptr=self.get_indptr())

    def __getitem__(self, i):
        return self.data[i]

    def __len__(self):
        return int(self.data.shape[0])

    def __repr__(self):
        return (f'Index({list(self.data.shape)}, '
                f'dim_size={self.dim_size}, is_sorted={self.is_sorted})')


class HashTensor:
    """Global->local id map (reference ``hash_tensor.py:89``).

    Dense-table mode (device gather) when ``max_key`` is modest;
    dict mode otherwise (host).
    """
    _DENSE_LIMIT = 1 << 26

    def __init__(self, keys, values=None):
        keys = np.asarray(keys)
        self._max_key = int(keys.max()) + 1 if keys.size else 0
        self._values = (np.asarray(values) if values is not None
                        else np.arange(len(keys)))
        if self._max_key <= self._DENSE_LIMIT:
            table = np.full(self._max_key + 1, -1,
                            self._values.dtype
                            if np.issubdtype(self._values.dtype,
                                             np.integer) else np.int64)
            table[keys] = self._values
            self._table = jnp.asarray(table)
            self._dict = None
        else:
            self._table = None
            self._dict = {int(k): v for k, v in zip(keys, self._values)}

    def __getitem__(self, query):
        if self._table is not None:
            q = jnp.asarray(query)
            safe = jnp.clip(q, 0, self._max_key)
            return self._table[safe]
        q = np.asarray(query)
        return np.array([self._dict.get(int(k), -1) for k in q.reshape(-1)
                         ]).reshape(q.shape)

    def get(self, query, default=-1):
        out = self[query]
        return out

    def __len__(self):
        return (int((np.asarray(self._table) >= 0).sum())
                if self._table is not None else len(self._dict))
