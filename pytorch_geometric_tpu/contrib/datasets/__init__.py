"""contrib.datasets namespace (reference: empty staging area)."""
__all__ = []
