from .attacks import PRBCDAttack, GRBCDAttack
from .pgm_explainer import PGMExplainer
from . import nn, explain, datasets, transforms  # noqa: F401 (namespaces)

__all__ = ['PRBCDAttack', 'GRBCDAttack', 'PGMExplainer']

# reference contrib alias
from ..explain import GraphMaskExplainer as NewGraphMaskExplainer
__all__ = __all__ + ['NewGraphMaskExplainer']
