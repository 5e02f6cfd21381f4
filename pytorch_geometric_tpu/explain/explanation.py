"""Explanation container (reference
``torch_geometric/explain/explanation.py``)."""

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclass
class Explanation:
    """Node/edge attribution masks + context."""
    node_mask: Optional[jnp.ndarray] = None
    edge_mask: Optional[jnp.ndarray] = None
    x: Optional[jnp.ndarray] = None
    edge_index: Optional[jnp.ndarray] = None
    target: Optional[jnp.ndarray] = None
    prediction: Optional[jnp.ndarray] = None
    extras: dict = field(default_factory=dict)

    def get_explanation_subgraph(self, node_thresh: float = 0.0,
                                 edge_thresh: float = 0.0):
        """Keep attributes above threshold (reference
        ``explanation.py:get_explanation_subgraph``)."""
        nm = (np.asarray(self.node_mask) > node_thresh
              if self.node_mask is not None else None)
        em = (np.asarray(self.edge_mask) > edge_thresh
              if self.edge_mask is not None else None)
        return nm, em

    def threshold(self, method: str = 'topk', value: float = 10):
        """Post-process masks (reference ``explain/config.py:Threshold``)."""
        out = Explanation(**{**self.__dict__})
        for attr in ('node_mask', 'edge_mask'):
            m = getattr(self, attr)
            if m is None:
                continue
            m = np.asarray(m)
            if method == 'hard':
                new = (m > value).astype(np.float32)
            elif method in ('topk', 'topk_hard'):
                k = min(int(value), m.size)
                flat = m.reshape(-1)
                idx = np.argpartition(-flat, k - 1)[:k]
                new = np.zeros_like(flat)
                new[idx] = flat[idx] if method == 'topk' else 1.0
                new = new.reshape(m.shape)
            else:
                raise ValueError(f"Unknown threshold '{method}'")
            setattr(out, attr, jnp.asarray(new))
        return out


def _threshold_mask(m: np.ndarray, method: str, value: float
                    ) -> np.ndarray:
    """Shared mask post-processing (reference ``config.py:Threshold``)."""
    if method == 'hard':
        return (m > value).astype(np.float32)
    if method in ('topk', 'topk_hard'):
        k = min(int(value), m.size)
        flat = m.reshape(-1)
        idx = np.argpartition(-flat, max(k - 1, 0))[:k]
        new = np.zeros_like(flat)
        new[idx] = flat[idx] if method == 'topk' else 1.0
        return new.reshape(m.shape)
    raise ValueError(f"Unknown threshold '{method}'")


class HeteroExplanation:
    """Typed explanation container (reference
    ``explain/explanation.py:HeteroExplanation``): per-type node/edge
    masks with Explanation's thresholding semantics."""

    def __init__(self):
        from ..data import HeteroData
        self.data = HeteroData()

    def __getitem__(self, key):
        return self.data[key]

    @property
    def node_types(self):
        return self.data.node_types

    @property
    def edge_types(self):
        return self.data.edge_types

    def validate_masks(self) -> bool:
        for t in self.node_types:
            m = self.data[t].get('node_mask')
            if m is not None:
                assert np.asarray(m).ndim >= 1
        return True

    def threshold(self, method: str = 'topk', value: float = 10
                  ) -> 'HeteroExplanation':
        out = HeteroExplanation()
        for t in self.node_types:
            for k, v in self.data[t].items():
                val = (_threshold_mask(np.asarray(v), method, value)
                       if k.endswith('mask') else v)
                setattr(out.data[t], k, val)
        for et in self.edge_types:
            for k, v in self.data[et].items():
                val = (_threshold_mask(np.asarray(v), method, value)
                       if k.endswith('mask') else v)
                setattr(out.data[et], k, val)
        return out
