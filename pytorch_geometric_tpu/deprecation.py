"""Deprecation + lazy-import helpers (reference
``torch_geometric/deprecation.py`` and ``lazy_loader.py``)."""

import functools
import importlib
import inspect
import types
import warnings
from typing import Any, Callable, Optional


def deprecated(details: Optional[str] = None,
               func_name: Optional[str] = None) -> Callable:
    """Decorator emitting a deprecation warning on call; works on
    functions and classes."""
    def decorator(obj: Callable) -> Callable:
        name = func_name or obj.__name__
        if inspect.isclass(obj):
            sub = type(obj.__name__, (obj,), {})
            sub.__init__ = deprecated(details, name)(obj.__init__)
            sub.__doc__ = obj.__doc__
            return sub

        @functools.wraps(obj)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            msg = f"'{name}' is deprecated"
            if details is not None:
                msg += f", {details}"
            warnings.warn(msg, stacklevel=2)
            return obj(*args, **kwargs)

        return wrapper

    return decorator


class LazyLoader(types.ModuleType):
    """Module placeholder that imports its target on first attribute
    access (reference ``lazy_loader.py``)."""

    def __init__(self, local_name: str, parent_globals: dict,
                 name: str) -> None:
        self._local_name = local_name
        self._parent_globals = parent_globals
        super().__init__(name)

    def _load(self) -> types.ModuleType:
        module = importlib.import_module(self.__name__)
        self._parent_globals[self._local_name] = module
        self.__dict__.update(module.__dict__)
        return module

    def __getattr__(self, item: str) -> Any:
        return getattr(self._load(), item)

    def __dir__(self):
        return dir(self._load())
