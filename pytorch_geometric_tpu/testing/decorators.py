"""Test decorators (reference ``torch_geometric/testing/decorators.py:
18-291`` — onlyFullTest, onlyCUDA->onlyTPU, withPackage,
withCUDA/withMETIS analogs)."""

import importlib.util
import os
from typing import Callable

import pytest


def has_package(name: str) -> bool:
    return importlib.util.find_spec(name) is not None


def onlyFullTest(fn: Callable) -> Callable:
    """Gate slow tests behind FULL_TEST=1 (reference ``decorators.py:
    onlyFullTest``)."""
    return pytest.mark.skipif(
        os.environ.get('FULL_TEST', '0') != '1',
        reason='Fast test run (set FULL_TEST=1)')(fn)


def onlyTPU(fn: Callable) -> Callable:
    """(reference onlyCUDA)."""
    import jax
    try:
        on_tpu = jax.default_backend() in ('tpu', 'axon')
    except Exception:
        on_tpu = False
    return pytest.mark.skipif(not on_tpu, reason='TPU required')(fn)


def withPackage(*names: str) -> Callable:
    """(reference ``decorators.py:withPackage``)."""

    def deco(fn):
        missing = [n for n in names if not has_package(n)]
        return pytest.mark.skipif(
            bool(missing), reason=f'Missing packages {missing}')(fn)
    return deco


def withNativeSampler(fn: Callable) -> Callable:
    """Skip unless the C++ sampler built (the WITH_* capability-flag
    discipline of reference ``typing.py``)."""
    from ..csrc import WITH_NATIVE_SAMPLER
    return pytest.mark.skipif(not WITH_NATIVE_SAMPLER,
                              reason='native sampler unavailable')(fn)
