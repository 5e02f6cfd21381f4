"""FeatureStore / GraphStore abstractions.

Reference: ``torch_geometric/data/feature_store.py:260`` (``TensorAttr``
``:46``, ``AttrView :87``) and ``graph_store.py:101`` (``EdgeAttr :53``,
``EdgeLayout :46``). These back remote/partitioned feature storage; the
in-memory reference implementations here double as the test mocks
(reference ``testing/feature_store.py`` / ``graph_store.py``).
"""

from dataclasses import dataclass
from enum import Enum
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class TensorAttr:
    """(reference ``feature_store.py:46``)."""
    group_name: Optional[str] = None
    attr_name: Optional[str] = None
    index: Any = None

    def is_fully_specified(self) -> bool:
        return self.group_name is not None and self.attr_name is not None


class FeatureStore:
    """Abstract KV tensor store (reference ``feature_store.py:260``)."""

    def _put_tensor(self, tensor, attr: TensorAttr) -> bool:
        raise NotImplementedError

    def _get_tensor(self, attr: TensorAttr):
        raise NotImplementedError

    def _remove_tensor(self, attr: TensorAttr) -> bool:
        raise NotImplementedError

    # -- public API ---------------------------------------------------------
    def put_tensor(self, tensor, group_name=None, attr_name=None,
                   index=None) -> bool:
        return self._put_tensor(
            np.asarray(tensor),
            TensorAttr(group_name, attr_name, index))

    def get_tensor(self, group_name=None, attr_name=None, index=None):
        out = self._get_tensor(TensorAttr(group_name, attr_name, index))
        if out is None:
            raise KeyError((group_name, attr_name))
        return out

    def multi_get_tensor(self, attrs: List[TensorAttr]):
        return [self.get_tensor(a.group_name, a.attr_name, a.index)
                for a in attrs]

    def remove_tensor(self, group_name=None, attr_name=None) -> bool:
        return self._remove_tensor(TensorAttr(group_name, attr_name))

    def get_all_tensor_attrs(self) -> List[TensorAttr]:
        raise NotImplementedError

    def __getitem__(self, key: Tuple[str, str]):
        return self.get_tensor(*key)

    def __setitem__(self, key: Tuple[str, str], value):
        self.put_tensor(value, *key)


class InMemoryFeatureStore(FeatureStore):
    """Dict-backed store (reference ``testing/feature_store.py``)."""

    def __init__(self):
        self._store: Dict[Tuple[str, str], np.ndarray] = {}

    def _put_tensor(self, tensor, attr):
        key = (attr.group_name, attr.attr_name)
        if attr.index is not None:
            self._store[key][np.asarray(attr.index)] = tensor
        else:
            self._store[key] = tensor
        return True

    def _get_tensor(self, attr):
        key = (attr.group_name, attr.attr_name)
        out = self._store.get(key)
        if out is not None and attr.index is not None:
            return out[np.asarray(attr.index)]
        return out

    def _remove_tensor(self, attr):
        return self._store.pop(
            (attr.group_name, attr.attr_name), None) is not None

    def get_all_tensor_attrs(self):
        return [TensorAttr(g, a) for (g, a) in self._store]


class EdgeLayout(Enum):
    """(reference ``graph_store.py:46``)."""
    COO = 'coo'
    CSR = 'csr'
    CSC = 'csc'


@dataclass(frozen=True)
class EdgeAttr:
    """(reference ``graph_store.py:53``)."""
    edge_type: Any
    layout: EdgeLayout = EdgeLayout.COO
    is_sorted: bool = False
    size: Optional[Tuple[int, int]] = None


class GraphStore:
    """Abstract edge store (reference ``graph_store.py:101``)."""

    def _put_edge_index(self, edge_index, attr: EdgeAttr) -> bool:
        raise NotImplementedError

    def _get_edge_index(self, attr: EdgeAttr):
        raise NotImplementedError

    def put_edge_index(self, edge_index, edge_type,
                       layout=EdgeLayout.COO, is_sorted=False,
                       size=None) -> bool:
        if isinstance(layout, str):
            layout = EdgeLayout(layout)
        return self._put_edge_index(
            edge_index, EdgeAttr(edge_type, layout, is_sorted, size))

    def get_edge_index(self, edge_type, layout=EdgeLayout.COO):
        if isinstance(layout, str):
            layout = EdgeLayout(layout)
        out = self._get_edge_index(EdgeAttr(edge_type, layout))
        if out is None:
            raise KeyError((edge_type, layout))
        return out

    def get_all_edge_attrs(self) -> List[EdgeAttr]:
        raise NotImplementedError

    # layout conversions (reference graph_store.py coo()/csr()/csc())
    def coo(self, edge_type):
        return self.get_edge_index(edge_type, EdgeLayout.COO)

    def csc(self, edge_type):
        row, col = self.coo(edge_type)
        order = np.argsort(col, kind='stable')
        n = int(col.max()) + 1 if len(col) else 0
        colptr = np.searchsorted(col[order], np.arange(n + 1))
        return colptr, row[order], order

    def csr(self, edge_type):
        row, col = self.coo(edge_type)
        order = np.argsort(row, kind='stable')
        n = int(row.max()) + 1 if len(row) else 0
        rowptr = np.searchsorted(row[order], np.arange(n + 1))
        return rowptr, col[order], order


class InMemoryGraphStore(GraphStore):
    """(reference ``testing/graph_store.py``)."""

    def __init__(self):
        self._store: Dict[Any, Tuple[np.ndarray, EdgeAttr]] = {}

    def _put_edge_index(self, edge_index, attr):
        self._store[attr.edge_type] = (np.asarray(edge_index), attr)
        return True

    def _get_edge_index(self, attr):
        got = self._store.get(attr.edge_type)
        if got is None:
            return None
        ei, stored = got
        if attr.layout == stored.layout:
            return ei
        if attr.layout == EdgeLayout.COO and \
                stored.layout != EdgeLayout.COO:
            raise NotImplementedError
        return ei

    def get_all_edge_attrs(self):
        return [attr for (_, attr) in self._store.values()]
