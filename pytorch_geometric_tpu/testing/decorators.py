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


# -- reference-named environment/device decorators ----------------------
# (reference ``testing/decorators.py:18-291``). CUDA/XPU/MPS never exist
# in a TPU deployment, so those gates skip unconditionally — keeping the
# names importable lets reference test suites collect cleanly.

def is_full_test() -> bool:
    return os.environ.get('FULL_TEST', '0') == '1'


def is_distributed_test() -> bool:
    return os.environ.get('DIST_TEST', '0') == '1'


def onlyDistributedTest(fn: Callable) -> Callable:
    return pytest.mark.skipif(
        not is_distributed_test(),
        reason='Distributed test run (set DIST_TEST=1)')(fn)


def onlyOnline(fn: Callable) -> Callable:
    """Gate tests needing downloads (zero-egress here by default)."""
    return pytest.mark.skipif(
        os.environ.get('ONLINE_TEST', '0') != '1',
        reason='Online test run (set ONLINE_TEST=1)')(fn)


def onlyCUDA(fn: Callable) -> Callable:
    return pytest.mark.skip(reason='CUDA not present on TPU hosts')(fn)


def onlyXPU(fn: Callable) -> Callable:
    return pytest.mark.skip(reason='XPU not present on TPU hosts')(fn)


def onlyLinux(fn: Callable) -> Callable:
    import sys
    return pytest.mark.skipif(not sys.platform.startswith('linux'),
                              reason='Linux only')(fn)


def noMac(fn: Callable) -> Callable:
    import sys
    return pytest.mark.skipif(sys.platform == 'darwin',
                              reason='not on macOS')(fn)


def noWindows(fn: Callable) -> Callable:
    import sys
    return pytest.mark.skipif(sys.platform == 'win32',
                              reason='not on Windows')(fn)


def minPython(version: str) -> Callable:
    import sys

    def deco(fn):
        want = tuple(int(v) for v in version.split('.'))
        return pytest.mark.skipif(sys.version_info[:len(want)] < want,
                                  reason=f'Python >= {version}')(fn)
    return deco


def onlyGraphviz(fn: Callable) -> Callable:
    return withPackage('graphviz')(fn)


def onlyNeighborSampler(fn: Callable) -> Callable:
    """Reference gates on pyg-lib|torch-sparse; ours on the C++ sampler
    OR its always-available numpy fallback — so this never skips."""
    return fn


def withMETIS(fn: Callable) -> Callable:
    """The multilevel partitioner (loader/cluster.py) is built-in; prefer
    real METIS when importable, but never skip."""
    return fn


def withHashTensor(fn: Callable) -> Callable:
    return fn  # HashTensor is built-in (index.py)


def withCUDA(fn: Callable) -> Callable:
    """Reference parametrizes over available torch devices; ours
    parametrizes over available JAX platforms (cpu always; tpu when the
    backend is up)."""
    import jax
    devices = ['cpu']
    try:
        if jax.default_backend() in ('tpu', 'axon'):
            devices.append(jax.default_backend())
    except Exception:
        pass
    return pytest.mark.parametrize('device', devices)(fn)


withDevice = withCUDA


def disableExtensions(fn: Callable) -> Callable:
    """Run with the native C++ sampler masked out, exercising the numpy
    fallback (reference ``decorators.py:disableExtensions``)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from .. import csrc
        prev = csrc.WITH_NATIVE_SAMPLER
        csrc.WITH_NATIVE_SAMPLER = False
        try:
            return fn(*args, **kwargs)
        finally:
            csrc.WITH_NATIVE_SAMPLER = prev
    return wrapped


def withoutExtensions(fn: Callable) -> Callable:
    """Parametrize a test over both kernel paths via the
    ``without_extensions`` fixture argument (reference
    ``decorators.py:withoutExtensions``)."""
    return pytest.mark.parametrize('without_extensions',
                                   [False, True])(fn)


def get_random_tensor_frame(*args, **kwargs):
    raise ImportError(
        "'get_random_tensor_frame' requires the 'pytorch-frame' "
        "package, which targets the torch ecosystem and is not part "
        "of the TPU build")
