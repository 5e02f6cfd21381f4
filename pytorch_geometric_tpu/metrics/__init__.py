from .link_pred import (LinkPredMetric, LinkPredPrecision, LinkPredRecall,
                        LinkPredF1, LinkPredMAP, LinkPredNDCG,
                        LinkPredMRR, LinkPredHitRatio,
                        LinkPredMetricCollection, LinkPredCoverage,
                        LinkPredDiversity, LinkPredPersonalization,
                        LinkPredAveragePopularity)

__all__ = [
    'LinkPredMetric', 'LinkPredPrecision', 'LinkPredRecall', 'LinkPredF1',
    'LinkPredMAP', 'LinkPredNDCG', 'LinkPredMRR', 'LinkPredHitRatio',
    'LinkPredMetricCollection', 'LinkPredCoverage', 'LinkPredDiversity',
    'LinkPredPersonalization', 'LinkPredAveragePopularity',
]
