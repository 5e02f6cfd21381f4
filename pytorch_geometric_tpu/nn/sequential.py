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
