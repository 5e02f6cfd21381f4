"""Explainer facade (reference ``torch_geometric/explain/explainer.py:29``)."""

from typing import Callable, Optional

import jax.numpy as jnp

from .algorithm import ExplainerAlgorithm
from .config import ExplainerConfig, ModelConfig, Threshold
from .explanation import Explanation


class Explainer:
    """Ties model + algorithm + configs (reference ``explainer.py:29``).

    ``model_fn(x, edge_weight) -> logits`` is a pure function closing
    over trained parameters (the functional analog of the reference's
    ``model`` module argument).
    """

    def __init__(self, model_fn: Callable,
                 algorithm: ExplainerAlgorithm,
                 explanation_type: str = 'model',
                 model_config: Optional[ModelConfig] = None,
                 node_mask_type: Optional[str] = 'attributes',
                 edge_mask_type: Optional[str] = 'object',
                 threshold_config: Optional[Threshold] = None):
        self.model_fn = model_fn
        self.algorithm = algorithm
        self.config = ExplainerConfig(explanation_type, node_mask_type,
                                      edge_mask_type)
        self.model_config = model_config or ModelConfig()
        self.threshold_config = threshold_config

    def get_prediction(self, x, edge_weight=None):
        return self.model_fn(x, edge_weight)

    def __call__(self, x, edge_index,
                 target: Optional[jnp.ndarray] = None,
                 index: Optional[int] = None, **kwargs) -> Explanation:
        if target is None:
            if self.config.explanation_type == 'phenomenon':
                raise ValueError(
                    "explanation_type='phenomenon' requires a target")
            pred = self.get_prediction(x)
            target = pred.argmax(-1)
        from .algorithm import GNNExplainer
        if (isinstance(self.algorithm, GNNExplainer)
                and 'node_mask_type' not in kwargs
                and self.config.node_mask_type is not None):
            kwargs['node_mask_type'] = self.config.node_mask_type
        out = self.algorithm(self.model_fn, x, edge_index, target,
                             index=index, **kwargs)
        if self.threshold_config is not None:
            out = out.threshold(self.threshold_config.type,
                                self.threshold_config.value)
        return out
