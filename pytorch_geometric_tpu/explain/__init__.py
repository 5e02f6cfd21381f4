from .explanation import Explanation, HeteroExplanation
from .config import ExplainerConfig, ModelConfig, Threshold, ThresholdConfig
from .explainer import Explainer
from .algorithm import (ExplainerAlgorithm, GNNExplainer, DummyExplainer,
                        AttentionExplainer)
from .metric import (groundtruth_metrics, fidelity,
                     characterization_score, unfaithfulness)

__all__ = [
    'Explanation', 'HeteroExplanation', 'ThresholdConfig', 'ExplainerConfig', 'ModelConfig', 'Threshold',
    'Explainer', 'ExplainerAlgorithm', 'GNNExplainer', 'DummyExplainer',
    'AttentionExplainer', 'groundtruth_metrics', 'fidelity',
    'characterization_score', 'unfaithfulness',
]
