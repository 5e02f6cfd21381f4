from .attacks import PRBCDAttack, GRBCDAttack
from .pgm_explainer import PGMExplainer

__all__ = ['PRBCDAttack', 'GRBCDAttack', 'PGMExplainer']
