"""Model summary table (reference ``torch_geometric/nn/summary.py:13``)."""

from typing import Any

import numpy as np


def summary(params: Any, max_depth: int = 3) -> str:
    """Render a parameter-tree table with per-module counts."""
    import jax

    rows = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups = {}
    for path, leaf in flat:
        keys = [getattr(p, 'key', getattr(p, 'idx', str(p)))
                for p in path]
        mod = '/'.join(str(k) for k in keys[:max_depth])
        groups.setdefault(mod, 0)
        groups[mod] += int(np.prod(leaf.shape)) if hasattr(
            leaf, 'shape') else 1
    total = sum(groups.values())
    width = max((len(k) for k in groups), default=10) + 2
    lines = [f"{'Module':<{width}} | #Params",
             '-' * (width + 10)]
    for k, v in sorted(groups.items()):
        lines.append(f'{k:<{width}} | {v:,}')
    lines.append('-' * (width + 10))
    lines.append(f"{'Total':<{width}} | {total:,}")
    return '\n'.join(lines)
