"""Extension registry (reference ``torch_geometric/graphgym/register.py``)."""

from typing import Any, Callable, Dict

registry: Dict[str, Dict[str, Any]] = {
    'act': {}, 'node_encoder': {}, 'edge_encoder': {}, 'stage': {},
    'layer': {}, 'pooling': {}, 'network': {}, 'config': {},
    'dataset': {}, 'loader': {}, 'optimizer': {}, 'scheduler': {},
    'loss': {}, 'train': {}, 'metric': {},
}


def register(kind: str, name: str, obj: Any = None):
    """``@register('layer', 'myconv')`` decorator or direct call
    (reference ``register.py:register_base``)."""
    if kind not in registry:
        registry[kind] = {}

    def _do(o):
        registry[kind][name] = o
        return o

    if obj is not None:
        return _do(obj)
    return _do
