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


def register_base(mapping: Dict[str, Any], key: str, module: Any = None):
    """Reference-shaped entry point (``register.py:21``): mapping is one
    of the registry's kind dicts."""
    def _do(o):
        mapping[key] = o
        return o
    return _do(module) if module is not None else _do


def _make_register(kind: str) -> Callable:
    def _register(key: str, module: Any = None):
        return register_base(registry[kind], key, module)
    _register.__name__ = f'register_{kind}'
    _register.__doc__ = (f"Registers a custom '{kind}' component "
                         f"(reference ``register.py:register_{kind}``).")
    return _register


register_act = _make_register('act')
register_node_encoder = _make_register('node_encoder')
register_edge_encoder = _make_register('edge_encoder')
register_stage = _make_register('stage')
register_head = _make_register('head')
register_layer = _make_register('layer')
register_pooling = _make_register('pooling')
register_network = _make_register('network')
register_config = _make_register('config')
register_dataset = _make_register('dataset')
register_loader = _make_register('loader')
register_optimizer = _make_register('optimizer')
register_scheduler = _make_register('scheduler')
register_loss = _make_register('loss')
register_train = _make_register('train')
register_metric = _make_register('metric')

registry.setdefault('head', {})
