"""ConfigMixin — serialize/deserialize a class to its dataclass schema.

Reference: ``torch_geometric/config_mixin.py`` (115 LoC). ``config()``
walks the registered schema's fields and snapshots the instance;
``from_config()`` re-instantiates from a dataclass or a plain dict
carrying ``_target_``. Containers recurse (lists/dicts of ConfigMixin
values); flax modules are dataclasses already, so their fields read
directly.
"""

import inspect
from dataclasses import fields, is_dataclass
from importlib import import_module
from typing import Any, Dict

from .config_store import class_from_dataclass, dataclass_from_class


class ConfigMixin:
    """Serialize/deserialize self to the registered dataclass schema."""

    def config(self) -> Any:
        """A serializable configuration of this instance."""
        data_cls = dataclass_from_class(self.__class__)
        if data_cls is None:
            raise ValueError(
                f"Could not find the configuration class that belongs to "
                f"'{self.__class__.__name__}'. Please register it in the "
                f"configuration store.")
        kwargs: Dict[str, Any] = {}
        for f in fields(data_cls):
            if not hasattr(self, f.name):
                continue
            kwargs[f.name] = _recursive_config(getattr(self, f.name))
        return data_cls(**kwargs)

    @classmethod
    def from_config(cls, cfg: Any, *args: Any, **kwargs: Any) -> Any:
        """Instantiate from a schema instance or ``_target_`` dict."""
        if getattr(cfg, '_target_', None):
            cls = _locate_cls(cfg._target_)
        elif isinstance(cfg, dict) and '_target_' in cfg:
            cls = _locate_cls(cfg['_target_'])

        data_cls = cfg.__class__
        if not is_dataclass(data_cls):
            data_cls = dataclass_from_class(cls)
            if data_cls is None:
                raise ValueError(
                    f"Could not find the configuration class that belongs "
                    f"to '{cls.__name__}'. Please register it in the "
                    f"configuration store.")

        field_names = {f.name for f in fields(data_cls)}
        if isinstance(cfg, dict):
            cfg = data_cls(**{k: v for k, v in cfg.items()
                              if k in field_names})
        assert is_dataclass(cfg)

        if args:  # positional -> keyword
            param_names = [p for p in inspect.signature(cls).parameters
                           if p not in ('args', 'kwargs')]
            for name, arg in zip(param_names, args):
                kwargs[name] = arg

        for key in field_names:
            if key not in kwargs and key != '_target_':
                kwargs[key] = _recursive_from_config(getattr(cfg, key))
        return cls(**kwargs)


def _recursive_config(value: Any) -> Any:
    if isinstance(value, ConfigMixin):
        return value.config()
    if isinstance(value, (tuple, list)):
        return [_recursive_config(v) for v in value]
    if isinstance(value, dict):
        return {k: _recursive_config(v) for k, v in value.items()}
    return value


def _recursive_from_config(value: Any) -> Any:
    cls: Any = None
    if is_dataclass(value):
        if getattr(value, '_target_', None):
            try:
                cls = _locate_cls(value._target_)
            except ImportError:
                pass  # keep the dataclass as it is
        else:
            cls = class_from_dataclass(value.__class__)
    elif isinstance(value, dict) and '_target_' in value:
        cls = _locate_cls(value['_target_'])

    if cls is not None and issubclass(cls, ConfigMixin):
        return cls.from_config(value)
    if isinstance(value, (tuple, list)):
        return [_recursive_from_config(v) for v in value]
    if isinstance(value, dict):
        return {k: _recursive_from_config(v) for k, v in value.items()}
    return value


def _locate_cls(qualname: str) -> Any:
    parts = qualname.split('.')
    if len(parts) <= 1:
        raise ValueError(f"Qualified name is missing a dot "
                         f"(got '{qualname}')")
    if any(len(p) == 0 for p in parts):
        raise ValueError(f"Relative imports not supported "
                         f"(got '{qualname}')")
    module_name, cls_name = '.'.join(parts[:-1]), parts[-1]
    return getattr(import_module(module_name), cls_name)
