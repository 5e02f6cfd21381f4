from .attacks import PRBCDAttack

__all__ = ['PRBCDAttack']
