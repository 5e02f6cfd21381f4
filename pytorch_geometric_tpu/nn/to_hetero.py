"""to_hetero — duplicate a homogeneous GNN per edge type.

Reference: ``torch_geometric/nn/to_hetero_transformer.py:123`` rewrites
the fx graph, duplicating each MessagePassing module per edge type and
grouping per-destination outputs; ``to_hetero_module.py`` is the
module-level variant. Under JAX there is no module graph to rewrite —
tracing is already functional — so this is the module-level design: each
layer becomes a ``HeteroConv`` over the metadata's edge types, and
activations/norms apply per node type.
"""

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as fnn
import jax.numpy as jnp

from .conv.hetero_conv import HeteroConv
from .message_passing import MessagePassing

EdgeType = Tuple[str, str, str]


class ToHetero(fnn.Module):
    """Heterogeneous wrapper of a stack of homogeneous convs.

    ``layers``: sequence of entries; a MessagePassing conv is duplicated
    per edge type (independent parameters, like the reference), any other
    callable (activation / norm-free fn) is applied per node type.
    """
    layers: Sequence[Any]
    metadata: Tuple[Tuple[str, ...], Tuple[EdgeType, ...]]
    aggr: str = 'sum'

    @fnn.compact
    def __call__(self, x_dict, edge_index_dict, **kwargs):
        node_types, edge_types = self.metadata
        for i, layer in enumerate(self.layers):
            if isinstance(layer, MessagePassing):
                fields = {f.name: getattr(layer, f.name)
                          for f in dataclasses.fields(type(layer))
                          if f.name not in ('parent', 'name')}
                convs = {et: type(layer)(**fields) for et in edge_types}
                x_dict = HeteroConv(convs=convs, aggr=self.aggr,
                                    name=f'layer_{i}')(
                    x_dict, edge_index_dict)
            else:
                x_dict = {t: layer(v) for t, v in x_dict.items()}
        return x_dict


def to_hetero(module_or_layers, metadata, aggr: str = 'sum') -> ToHetero:
    """(reference ``to_hetero_transformer.py:to_hetero``)."""
    layers = (list(module_or_layers)
              if isinstance(module_or_layers, (list, tuple))
              else [module_or_layers])
    return ToHetero(layers=tuple(layers),
                    metadata=(tuple(metadata[0]), tuple(metadata[1])),
                    aggr=aggr)


def to_hetero_with_bases(module, metadata, num_bases: int,
                         in_channels=None, **kwargs):
    """Basis-decomposition hetero transform (reference
    ``nn/to_hetero_with_bases_transformer.py``): instead of one conv
    copy per edge type, each edge type mixes ``num_bases`` shared conv
    bases with learned per-type coefficients. Returns a flax module."""
    import flax.linen as fnn
    import jax.numpy as jnp

    node_types, edge_types = metadata

    class ToHeteroWithBases(fnn.Module):
        @fnn.compact
        def __call__(self, x_dict, edge_index_dict, **kw):
            import dataclasses
            # shared bases: clones of the template conv
            bases = []
            for b in range(num_bases):
                fields = {f.name: getattr(module, f.name)
                          for f in dataclasses.fields(type(module))
                          if f.name not in ('parent', 'name')}
                bases.append(type(module)(name=f'basis_{b}', **fields))
            coef = self.param(
                'basis_coef', fnn.initializers.normal(1.0 / num_bases),
                (len(edge_types), num_bases))
            out = {t: 0.0 for t in node_types}
            cnt = {t: 0 for t in node_types}
            for r, et in enumerate(edge_types):
                src_t, _, dst_t = et
                ei = edge_index_dict[et]
                pair = (x_dict[src_t], x_dict[dst_t])
                acc = 0.0
                for b in range(num_bases):
                    acc = acc + coef[r, b] * bases[b](pair, ei, **kw)
                out[dst_t] = out[dst_t] + acc
                cnt[dst_t] += 1
            return {t: out[t] for t in node_types if cnt[t] > 0}

    return ToHeteroWithBases()


def to_fixed_size(module, batch_size: int):
    """(reference ``nn/to_fixed_size_transformer.py:13``): pin the
    global-pool batch size. This framework is static-shape throughout —
    the returned wrapper just curries ``batch_size``."""
    import functools

    class FixedSize:
        def __init__(self):
            self.module = module
            self.batch_size = batch_size

        def init(self, *a, **k):
            k.setdefault('batch_size', batch_size)
            return module.init(*a, **k)

        def apply(self, *a, **k):
            k.setdefault('batch_size', batch_size)
            return module.apply(*a, **k)

    return FixedSize()
