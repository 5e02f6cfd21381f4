from .explanation import Explanation, HeteroExplanation
from .config import ExplainerConfig, ModelConfig, Threshold, ThresholdConfig
from .explainer import Explainer
from .algorithm import (ExplainerAlgorithm, GNNExplainer, DummyExplainer,
                        AttentionExplainer, PGExplainer,
                        GraphMaskExplainer, CaptumExplainer)
from .metric import (groundtruth_metrics, fidelity,
                     characterization_score, unfaithfulness)

__all__ = [
    'Explanation', 'HeteroExplanation', 'ExplainerConfig', 'ModelConfig',
    'Threshold', 'ThresholdConfig', 'Explainer', 'ExplainerAlgorithm',
    'GNNExplainer', 'DummyExplainer', 'AttentionExplainer',
    'PGExplainer', 'GraphMaskExplainer', 'CaptumExplainer',
    'groundtruth_metrics', 'fidelity', 'characterization_score',
    'unfaithfulness',
]
