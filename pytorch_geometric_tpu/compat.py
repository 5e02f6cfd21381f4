"""Compilation/interop shims (reference ``_compile.py``, ``_onnx.py``,
``isinstance.py``).

On TPU the compiler is XLA and "compiling" means "inside a jit trace",
so these map onto JAX's tracing machinery rather than TorchDynamo.
"""

import warnings
from typing import Any, Callable, Optional, Tuple, Type, Union

import jax


def is_compiling() -> bool:
    """Whether we are currently inside a ``jax.jit`` trace (reference
    ``_compile.py:9`` — torch.compile's dynamo probe)."""
    try:
        return not jax.core.trace_state_clean()
    except AttributeError:  # older/newer jax layouts
        try:
            from jax._src import core
            return not core.trace_state_clean()
        except Exception:
            return False


def compile(model: Optional[Callable] = None, *args: Any,
            **kwargs: Any) -> Callable:
    """Deprecated alias of :func:`jax.jit` (reference ``_compile.py:20``
    deprecates ``torch_geometric.compile`` in favor of
    ``torch.compile``). Kept so reference code ports line-for-line."""
    warnings.warn("'pytorch_geometric_tpu.compile' is deprecated; use "
                  "'jax.jit' directly instead", stacklevel=2)
    if model is None:
        return lambda m: jax.jit(m, *args, **kwargs)
    return jax.jit(model, *args, **kwargs)


def is_torch_instance(obj: Any, cls: Union[Type, Tuple[Type]]) -> bool:
    """``isinstance`` that sees through compiler wrappers (reference
    ``isinstance.py:11`` unwraps ``torch._dynamo`` OptimizedModule). JAX
    transforms wrap *functions*, not modules, so the only unwrapping
    needed here is of our own jitted callables via ``__wrapped__``."""
    obj = getattr(obj, '__wrapped__', obj)
    return isinstance(obj, cls)


def is_in_onnx_export() -> bool:
    """Whether torch is currently exporting to ONNX (reference
    ``_onnx.py:10``). Always ``False`` unless torch is mid-export."""
    try:
        import torch
        return torch.onnx.is_in_onnx_export()
    except Exception:
        return False


def safe_onnx_export(*args: Any, **kwargs: Any):
    """ONNX export is a torch-serialization concern with no TPU
    equivalent — JAX models export via ``jax.export`` / StableHLO.
    Gated stub mirroring the reference's optional-dependency errors."""
    raise NotImplementedError(
        "'safe_onnx_export' requires the torch ONNX exporter; on TPU "
        "use jax.export (StableHLO) to serialize compiled programs "
        "instead")
