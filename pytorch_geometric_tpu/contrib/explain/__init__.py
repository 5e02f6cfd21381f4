"""contrib.explain namespace (reference ``torch_geometric/contrib/explain``)."""
from ..pgm_explainer import PGMExplainer
from ...deprecation import deprecated
from ...explain import GraphMaskExplainer as NewGraphMaskExplainer

GraphMaskExplainer = deprecated(
    "use 'explain.algorithm.GraphMaskExplainer' instead")(
        NewGraphMaskExplainer)

__all__ = ['PGMExplainer']
