"""Explainer configuration (reference ``torch_geometric/explain/config.py``)."""

from dataclasses import dataclass
from typing import Optional


@dataclass
class ExplainerConfig:
    explanation_type: str = 'model'       # 'model' | 'phenomenon'
    node_mask_type: Optional[str] = 'attributes'  # None|object|common_attributes|attributes
    edge_mask_type: Optional[str] = 'object'


@dataclass
class ModelConfig:
    mode: str = 'multiclass_classification'  # binary_|multiclass_|regression
    task_level: str = 'node'                 # node | edge | graph
    return_type: str = 'raw'                 # raw | probs | log_probs


@dataclass
class Threshold:
    type: str = 'topk'
    value: float = 10


# reference-name alias (explain/config.py:ThresholdConfig)
ThresholdConfig = Threshold
