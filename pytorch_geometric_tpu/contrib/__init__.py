from .attacks import PRBCDAttack, GRBCDAttack
from .pgm_explainer import PGMExplainer

__all__ = ['PRBCDAttack', 'GRBCDAttack', 'PGMExplainer']

# reference contrib alias
from ..explain import GraphMaskExplainer as NewGraphMaskExplainer
__all__ = list(__all__) + ['NewGraphMaskExplainer'] if '__all__' in dir() else ['NewGraphMaskExplainer']
