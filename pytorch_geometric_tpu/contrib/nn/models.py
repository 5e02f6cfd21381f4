"""contrib.nn.models (reference ``contrib/nn/models/__init__.py``)."""
from ..attacks import PRBCDAttack, GRBCDAttack

__all__ = ['PRBCDAttack', 'GRBCDAttack']
