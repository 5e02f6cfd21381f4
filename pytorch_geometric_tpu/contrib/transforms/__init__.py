"""contrib.transforms namespace (reference: empty staging area)."""
__all__ = []
