"""Experimental-code warning helper for the contrib staging area."""
import warnings


def warn_experimental() -> None:
    warnings.warn(
        "'pytorch_geometric_tpu.contrib' contains experimental code and "
        "is subject to change. Please use with caution.", stacklevel=2)
