"""Model export for deployment — StableHLO serialization.

The reference ships two deployment paths: TorchScript
(``examples/cpp/main.cpp`` + jittable convs) and ONNX
(``torch_geometric/_onnx.py``). The TPU-native equivalent is
``jax.export``: a jitted forward is lowered once to StableHLO bytes
that a serving binary (C++ PJRT, TF-serving, or another Python
process) executes without the model code — the same
compile-once/serve-anywhere contract.

Static shapes are required — which the framework's padding-first
batching already guarantees; export one program per shape bucket
(see ``examples/aot_serving.py`` for the bucket recipe).
"""

import os.path as osp
from typing import Any, Callable, Optional, Sequence, Union

import jax

__all__ = ['export_program', 'load_program']


def export_program(fn: Callable, example_args: Sequence[Any],
                   path: Optional[str] = None,
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``jit(fn)`` at the example arguments' shapes.

    Args:
        fn: the forward function (e.g. ``lambda x, ei: model.apply(
            params, x, ei)`` — captured params are baked in as
            constants, like TorchScript's frozen weights).
        example_args: concrete arrays or ``jax.ShapeDtypeStruct``s
            fixing the input signature.
        path: optionally also write the bytes to this file.
        platforms: lowering platforms (default: the current backend;
            pass ``['tpu']`` or ``['cpu', 'tpu']`` to cross-export).

    Returns the serialized StableHLO bytes.
    """
    from jax import export as jexport

    import jax.numpy as jnp

    def spec(a):
        if isinstance(a, jax.ShapeDtypeStruct):
            return a
        a = a if hasattr(a, 'shape') else jnp.asarray(a)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    specs = [spec(a) for a in example_args]
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)
    exp = jexport.export(jax.jit(fn), **kwargs)(*specs)
    blob = exp.serialize()
    if path is not None:
        with open(path, 'wb') as f:
            f.write(blob)
    return blob


def load_program(src: Union[bytes, str]) -> Callable:
    """Deserialize ``export_program`` output (bytes or a file path)
    into a callable running the compiled program."""
    from jax import export as jexport

    if isinstance(src, str) and osp.exists(src):
        with open(src, 'rb') as f:
            src = f.read()
    exp = jexport.deserialize(src)
    return exp.call
