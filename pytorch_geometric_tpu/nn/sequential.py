"""Sequential — multi-signature layer chaining.

Reference: ``torch_geometric/nn/sequential.py:30`` generates a module
from jinja; here a plain flax module parses the same
``'x, edge_index -> x'`` signature strings at trace time (no codegen
needed — tracing is already staged).
"""

from typing import Any, List, Sequence, Tuple

import flax.linen as fnn


class Sequential(fnn.Module):
    """``Sequential('x, edge_index', [(conv, 'x, edge_index -> x'),
    (act,), ...])`` — mirrors the reference API."""
    input_args: str
    modules: Sequence[Any]

    @fnn.compact
    def __call__(self, *args, **kwargs):
        names = [a.strip() for a in self.input_args.split(',')]
        scope = dict(zip(names, args))
        scope.update(kwargs)
        out = args[0] if args else None
        for i, entry in enumerate(self.modules):
            if isinstance(entry, (tuple, list)):
                mod, sig = entry
                ins, _, outs = sig.partition('->')
                in_names = [s.strip() for s in ins.split(',')]
                out_names = [s.strip() for s in outs.split(',')
                             if s.strip()]
                res = mod(*[scope[s] for s in in_names])
                if len(out_names) <= 1:
                    scope[out_names[0] if out_names else 'x'] = res
                    out = res
                else:
                    for nm, v in zip(out_names, res):
                        scope[nm] = v
                    out = res
            else:
                out = entry(out)
                scope['x'] = out
        return out


class Reshape:
    """(reference ``nn/reshape.py``)."""

    def __init__(self, *shape):
        self.shape = shape

    def __call__(self, x):
        return x.reshape(self.shape)


class DataParallel:
    """(reference ``nn/data_parallel.py``): in JAX, data parallelism is
    a sharding annotation, not a module wrapper. This thin helper jits
    ``module.apply`` with the batch dim sharded over all local devices.
    """

    def __init__(self, module, axis_name: str = 'data'):
        import jax
        self.module = module
        mesh_devices = jax.local_devices()
        self.mesh = jax.sharding.Mesh(mesh_devices, (axis_name,))
        self.axis_name = axis_name

    def init(self, *a, **k):
        return self.module.init(*a, **k)

    def apply(self, params, *args, **kwargs):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(self.mesh, P(self.axis_name))
        args = tuple(jax.device_put(a, shard)
                     if hasattr(a, 'ndim') and a.ndim >= 1 else a
                     for a in args)
        return jax.jit(self.module.apply)(params, *args, **kwargs)
