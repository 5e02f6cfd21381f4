"""Layer-wise Profiler (reference ``torch_geometric/profile/profiler.py:
27,149-320`` — per-module forward hooks building an event tree with a
printed per-layer table).

Flax/TPU redesign: the reference's ``nn.Module`` forward hooks map to
``flax.linen.intercept_methods`` — one interceptor sees every submodule
``__call__`` with its module path, so a single apply yields the whole
event tree. Timing semantics: the profiled apply runs EAGERLY (op-by-op
dispatch) with a device barrier per module, because under jit XLA fuses
across module boundaries and per-layer wall times would be meaningless;
this matches the reference, whose hook-based times are also eager. Use
``profile.trace()``/``jax.profiler`` for fused-program timelines and
``count_flops`` (XLA cost analysis) for whole-program FLOPs.
"""

import time
from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _num_edges(args, kwargs=None) -> int:
    """Edge count from a module's call args: an EdgeIndex (has
    ``num_edges``) or a ``[2, E]`` integer array."""
    cand = list(args) + list((kwargs or {}).values())
    for a in cand:
        ne = getattr(a, 'num_edges', None)
        if ne is not None:
            return int(ne)
    for a in cand:
        if (hasattr(a, 'shape') and len(getattr(a, 'shape', ())) == 2
                and a.shape[0] == 2
                and np.issubdtype(np.asarray(a).dtype
                                  if not hasattr(a, 'dtype') else a.dtype,
                                  np.integer)):
            return int(a.shape[1])
    return 0


# attention-style convs: per-edge logit + segment softmax on top of the
# weighted aggregation (reference gat_conv.py:387-408 edge_update path)
_ATTENTION_CONVS = frozenset(
    n.lower() for n in
    ('GATConv', 'GATv2Conv', 'TransformerConv', 'RGATConv', 'HGTConv',
     'HANConv', 'AGNNConv', 'PointTransformerConv', 'HEATConv'))


def _analytic_flops(mod, args, out, kwargs=None) -> int:
    """Per-module analytic FLOPs for the layers whose cost is a closed
    form (the reference leans on fvcore's per-module handles,
    ``test/nn/test_fvcore.py``):

    * Dense/Linear family -> ``2 * batch * in * out`` (one GEMM);
    * MessagePassing convs -> the sparse aggregation
      ``2 * E * F_out`` (gather-multiply-segment-add per edge per
      output feature, the SpMM cost model of ``ops/spmm.py``), plus
      ``2 * E * F + 5 * E * H`` for attention convs (per-edge logits +
      segment softmax: max, sub, exp, segsum, div);

    their Linear children (the dense projections) report their own
    GEMMs and roll up into the conv row via the tree pass."""
    name = type(mod).__name__.lower()
    if name in ('dense', 'densegeneral', 'linear', 'heterolinear'):
        x = args[0] if args else None
        if hasattr(x, 'shape') and hasattr(out, 'shape') and x.ndim >= 1:
            batch = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
            return 2 * batch * int(x.shape[-1]) * int(out.shape[-1])
    from ..nn.message_passing import MessagePassing
    if isinstance(mod, MessagePassing):
        e = _num_edges(args, kwargs)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, 'shape') and getattr(x, 'ndim', 0) >= 1]
        if e and leaves:
            f = int(np.prod(leaves[0].shape[1:])) \
                if leaves[0].ndim > 1 else 1
            flops = 2 * e * f
            if name in _ATTENTION_CONVS:
                h = int(getattr(mod, 'heads', 1) or 1)
                flops += 2 * e * f + 5 * e * h
            return flops
    return 0


def _first_shape(tree) -> Tuple:
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, 'shape')]
    return tuple(leaves[0].shape) if leaves else ()


class Profiler:
    """``Profiler(model).profile(params, *args)`` -> per-module event
    rows (path, depth, calls, total/self wall time, output shape,
    analytic FLOPs), plus ``Profiler.format(rows)`` for the
    reference-style table."""

    def __init__(self, model):
        self.model = model

    def profile(self, params, *args, time_layers: bool = True,
                **kwargs) -> List[Dict[str, Any]]:
        import flax.linen as fnn

        events: Dict[Tuple[str, ...], Dict[str, Any]] = {}
        order: List[Tuple[str, ...]] = []

        def interceptor(next_fn, iargs, ikwargs, context):
            if context.method_name != '__call__':
                return next_fn(*iargs, **ikwargs)
            path = tuple(context.module.path)
            if time_layers:
                jax.block_until_ready(
                    [x for x in jax.tree_util.tree_leaves(iargs)
                     if hasattr(x, 'block_until_ready')])
                t0 = time.perf_counter()
            out = next_fn(*iargs, **ikwargs)
            dt = 0.0
            if time_layers:
                jax.block_until_ready(
                    [x for x in jax.tree_util.tree_leaves(out)
                     if hasattr(x, 'block_until_ready')])
                dt = time.perf_counter() - t0
            ev = events.get(path)
            if ev is None:
                events[path] = ev = {
                    'module': '/'.join(path) or '<root>',
                    'type': type(context.module).__name__,
                    'depth': len(path),  # 0 = root
                    'calls': 0, 'total_time_s': 0.0,
                    'flops': 0,
                    'output_shape': _first_shape(out),
                    'dtype': '',
                }
                leaves = [x for x in jax.tree_util.tree_leaves(out)
                          if hasattr(x, 'dtype')]
                if leaves:
                    ev['dtype'] = str(leaves[0].dtype)
                order.append(path)
            ev['calls'] += 1
            ev['total_time_s'] += dt
            ev['flops'] += _analytic_flops(context.module, iargs, out,
                                           ikwargs)
            return out

        with fnn.intercept_methods(interceptor):
            self.model.apply(params, *args, **kwargs)

        # self time = total - direct children's totals; FLOPs roll up
        # the other way (parents report the sum of their subtree)
        for path in sorted(order, key=len, reverse=True):
            ev = events[path]
            child_t = sum(e['total_time_s'] for p, e in events.items()
                          if len(p) == len(path) + 1
                          and p[:len(path)] == path)
            ev['self_time_s'] = max(ev['total_time_s'] - child_t, 0.0)
            ev['flops'] += sum(e['flops'] for p, e in events.items()
                               if len(p) == len(path) + 1
                               and p[:len(path)] == path)
        return [events[p] for p in order]

    @staticmethod
    def format(rows: List[Dict[str, Any]]) -> str:
        """Reference-style layer table (``profiler.py:149-320``): one
        indented row per module with calls, total/self time, FLOPs and
        output shape."""
        def name(r):
            return '  ' * r.get('depth', 0) + \
                r['module'].rsplit('/', 1)[-1]

        width = max((len(name(r)) for r in rows), default=10) + 2
        head = (f"{'Module':<{width}} | calls | total ms | self ms | "
                f"MFLOPs | Output shape | dtype")
        lines = [head, '-' * len(head)]
        for r in rows:
            lines.append(
                f"{name(r):<{width}} | {r.get('calls', 1):>5} | "
                f"{1e3 * r.get('total_time_s', 0.0):>8.3f} | "
                f"{1e3 * r.get('self_time_s', 0.0):>7.3f} | "
                f"{r.get('flops', 0) / 1e6:>6.2f} | "
                f"{str(r.get('output_shape', ())):<12} | "
                f"{r.get('dtype', '')}")
        return '\n'.join(lines)
