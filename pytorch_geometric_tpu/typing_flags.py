"""Capability flags (reference ``torch_geometric/typing.py:45-161``
``WITH_*`` discipline): every optional native/extra dependency has a
flag and every call site a pure fallback."""

import importlib.util


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


def _native_sampler() -> bool:
    try:
        from .csrc import WITH_NATIVE_SAMPLER
        return WITH_NATIVE_SAMPLER
    except Exception:
        return False


def _tpu() -> bool:
    try:
        import jax
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


WITH_NATIVE_SAMPLER = _native_sampler()
WITH_SCIPY = _has('scipy')
WITH_NETWORKX = _has('networkx')
WITH_TRANSFORMERS = _has('transformers')
WITH_HF_HUB = _has('huggingface_hub')
WITH_YAML = _has('yaml')
WITH_GRAPHVIZ = _has('graphviz')
WITH_MATPLOTLIB = _has('matplotlib')


def __getattr__(name: str):
    # WITH_TPU / WITH_PALLAS are lazy: computing them initializes the
    # default JAX backend, which must not happen at import time (a user
    # may still want to select a platform).
    if name in ('WITH_TPU', 'WITH_PALLAS'):
        return _tpu()
    raise AttributeError(name)
