from .link_pred import (LinkPredMetric, LinkPredPrecision, LinkPredRecall,
                        LinkPredF1, LinkPredMAP, LinkPredNDCG,
                        LinkPredMRR, LinkPredHitRatio,
                        LinkPredMetricCollection)

__all__ = [
    'LinkPredMetric', 'LinkPredPrecision', 'LinkPredRecall', 'LinkPredF1',
    'LinkPredMAP', 'LinkPredNDCG', 'LinkPredMRR', 'LinkPredHitRatio',
    'LinkPredMetricCollection',
]
