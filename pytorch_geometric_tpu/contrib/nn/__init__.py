"""contrib.nn namespace (reference ``torch_geometric/contrib/nn``)."""
from ..attacks import PRBCDAttack, GRBCDAttack

__all__ = ['PRBCDAttack', 'GRBCDAttack']
