"""Global configuration store — dataclass schemas from class signatures.

Reference: ``torch_geometric/config_store.py`` (477 LoC). Generates a
``dataclass`` schema for any class/factory by inspecting its signature
(``to_dataclass``), keeps them in a global singleton ``ConfigStore``
(grouped: transform / dataset / model / optimizer / lr_scheduler), and
resolves both directions (``dataclass_from_class`` /
``class_from_dataclass``). Hydra integration is optional in the
reference and absent here (no hydra in the image); the plain singleton
branch is the behavior contract. TPU-native differences: optimizers and
schedules come from ``optax`` (factory *functions*, not torch classes),
and models are flax dataclasses, whose generated ``__init__``
signatures inspect identically.
"""

import copy
import inspect
import typing
from collections import defaultdict
from dataclasses import dataclass, field, make_dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

EXCLUDE = {'self', 'args', 'kwargs', 'parent', 'name'}

MISSING = '???'

MAPPING: Dict[Any, Any] = {}


class _Singleton(type):
    _instances: Dict[type, Any] = {}

    def __call__(cls, *args: Any, **kwargs: Any) -> Any:
        if cls not in cls._instances:
            cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


@dataclass
class Metadata:
    orig_type: Optional[Any] = None


@dataclass
class ConfigNode:
    name: str
    node: Any
    group: Optional[str] = None
    _metadata: Metadata = field(default_factory=Metadata)


class ConfigStore(metaclass=_Singleton):
    """Reference ``config_store.py:95`` (non-hydra branch)."""

    def __init__(self) -> None:
        self.repo: Dict[str, Any] = defaultdict(dict)

    @classmethod
    def instance(cls, *args: Any, **kwargs: Any) -> 'ConfigStore':
        return cls(*args, **kwargs)

    def store(self, name: str, node: Any, group: Optional[str] = None,
              orig_type: Optional[Any] = None) -> None:
        cur = self.repo
        if group is not None:
            cur = cur[group]
        if name in cur:
            raise KeyError(f"Configuration '{name}' already registered. "
                           f"Please store it under a different group.")
        cur[name] = ConfigNode(name, node, group, Metadata(orig_type))


def get_config_store() -> ConfigStore:
    """The global configuration store."""
    return ConfigStore.instance()


def clear_config_store() -> ConfigStore:
    """Clear the global configuration store."""
    store = get_config_store()
    for key in list(store.repo.keys()):
        del store.repo[key]
    return store


def get_node(cls: Union[str, Any]) -> Optional[ConfigNode]:
    if not isinstance(cls, str) and getattr(cls, '__module__', '') in {
            'builtins', 'typing'}:
        return None

    def _candidates(repo: Dict[str, Any]) -> List[ConfigNode]:
        outs: List[ConfigNode] = []
        for key, value in repo.items():
            if isinstance(value, dict):
                outs.extend(_candidates(value))
            elif value.node == cls or value._metadata.orig_type == cls:
                outs.append(value)
            elif isinstance(cls, str) and key == cls:
                outs.append(value)
        return outs

    candidates = _candidates(get_config_store().repo)
    if len(candidates) > 1:
        raise ValueError(f"Found multiple entries in the configuration "
                         f"store for the same node '{candidates[0].name}'")
    return candidates[0] if candidates else None


def dataclass_from_class(cls: Union[str, Any]) -> Optional[Any]:
    """The registered dataclass schema of ``cls`` (or ``None``)."""
    node = get_node(cls)
    return node.node if node is not None else None


def class_from_dataclass(cls: Union[str, Any]) -> Optional[Any]:
    """The original class behind a registered schema (or ``None``)."""
    node = get_node(cls)
    return node._metadata.orig_type if node is not None else None


def map_annotation(annotation: Any,
                   mapping: Optional[Dict[Any, Any]] = None) -> Any:
    origin = getattr(annotation, '__origin__', None)
    args: Tuple[Any, ...] = getattr(annotation, '__args__', ())
    if origin in {Union, list, dict, tuple}:
        args = tuple(map_annotation(a, mapping) for a in args)
        if type(annotation).__name__ == 'GenericAlias':
            annotation = origin[args]  # e.g. list[...] / dict[...]
        else:
            annotation = copy.copy(annotation)
            annotation.__args__ = args
        return annotation
    if mapping is not None and annotation in mapping:
        return mapping[annotation]
    out = dataclass_from_class(annotation)
    return out if out is not None else annotation


def to_dataclass(cls: Any, base_cls: Optional[Any] = None,
                 with_target: Optional[bool] = None,
                 map_args: Optional[Dict[str, Tuple]] = None,
                 exclude_args: Optional[List[Any]] = None,
                 strict: bool = False) -> Any:
    """Convert a class's (or factory function's) ``__init__`` arguments
    to a dataclass schema (reference ``config_store.py:196``). The
    schema carries a ``_target_`` qualname so ``from_config`` can
    re-instantiate the original class."""
    fields_out: List[Tuple] = []
    fn = cls.__init__ if inspect.isclass(cls) else cls
    params = inspect.signature(fn).parameters

    if strict:
        keys = set() if map_args is None else set(map_args)
        if exclude_args is not None:
            keys |= {a for a in exclude_args if isinstance(a, str)}
        diff = keys - set(params)
        if diff:
            raise ValueError(f"Expected input argument(s) {diff} in "
                             f"'{cls.__name__}'")

    for i, (name, arg) in enumerate(params.items()):
        if name in EXCLUDE:
            continue
        if exclude_args is not None and (name in exclude_args
                                         or i in exclude_args):
            continue
        if base_cls is not None and name in getattr(
                base_cls, '__dataclass_fields__', {}):
            continue
        if map_args is not None and name in map_args:
            fields_out.append((name, ) + map_args[name])
            continue

        annotation = map_annotation(arg.annotation, MAPPING)
        default = arg.default

        if annotation is not inspect.Parameter.empty:
            # Union types (except Optional) aren't schema-safe:
            origin = getattr(annotation, '__origin__', None)
            args = getattr(annotation, '__args__', [])
            if origin == Union and type(None) in args and len(args) > 2:
                annotation = Optional[Any]
            elif origin == Union and type(None) not in args:
                annotation = Any
            elif origin == list and getattr(args[0], '__origin__',
                                            None) == Union:
                annotation = List[Any]
            elif origin == dict and getattr(args[1], '__origin__',
                                            None) == Union:
                annotation = Dict[args[0], Any]  # type: ignore
        else:
            annotation = Any

        if default is not inspect.Parameter.empty:
            if isinstance(default, (list, dict)):
                def _factory(d: Any) -> Callable[[], Any]:
                    return lambda: d

                default = field(default_factory=_factory(default))
        else:
            default = field(default=MISSING)
        fields_out.append((name, annotation, default))

    with_target = base_cls is not None if with_target is None else with_target
    if with_target:
        qual = f'{cls.__module__}.{cls.__qualname__}'
        fields_out.append(('_target_', str, field(default=qual)))

    return make_dataclass(getattr(cls, '__qualname__', cls.__name__),
                          fields=fields_out,
                          bases=() if base_cls is None else (base_cls, ))


def register(cls: Optional[Any] = None, data_cls: Optional[Any] = None,
             group: Optional[str] = None,
             **kwargs: Any) -> Union[Any, Callable]:
    """Register ``cls`` (auto-generating its dataclass schema) in the
    global store; usable as a decorator (reference
    ``config_store.py:329``)."""
    if cls is not None:
        name = cls.__name__
        if get_node(cls):
            raise ValueError(f"The class '{name}' is already registered "
                             f"in the global configuration store")
        if data_cls is None:
            data_cls = to_dataclass(cls, **kwargs)
        elif get_node(data_cls):
            raise ValueError(f"The data class '{data_cls.__name__}' is "
                             f"already registered in the global "
                             f"configuration store")
        get_config_store().store(name, data_cls, group, cls)
        return data_cls

    def bounded(cls: Any) -> Any:
        register(cls=cls, data_cls=data_cls, group=group, **kwargs)
        return cls

    return bounded


# -- base groups + bulk registration (reference config_store.py:375) ------

@dataclass
class Transform:
    pass


@dataclass
class Dataset:
    pass


@dataclass
class Model:
    pass


@dataclass
class Optimizer:
    pass


@dataclass
class LRScheduler:
    pass


@dataclass
class Config:
    dataset: Any = MISSING
    model: Any = MISSING
    optim: Any = MISSING
    lr_scheduler: Optional[Any] = None


def fill_config_store() -> None:
    """Register the transform / dataset / model catalog plus the optax
    optimizer and schedule factories."""
    import pytorch_geometric_tpu as pgt

    store = get_config_store()

    transforms = pgt.transforms
    for cls_name in sorted(set(transforms.__all__) - {
            'BaseTransform', 'Compose', 'ComposeFilters',
            'LinearTransformation', 'AddMetaPaths'}):
        cls = to_dataclass(getattr(transforms, cls_name),
                           base_cls=Transform)
        # extra nesting level allows composing several transforms
        store.store(cls_name, group='transform', node={cls_name: cls})

    datasets = pgt.datasets
    map_dataset_args: Dict[str, Any] = {
        'transform': (Dict[str, Transform], field(default_factory=dict)),
        'pre_transform': (Dict[str, Transform],
                          field(default_factory=dict)),
    }
    for cls_name in sorted(set(datasets.__all__)):
        obj = getattr(datasets, cls_name)
        if not inspect.isclass(obj):  # gated/aliased entries
            continue
        try:
            cls = to_dataclass(obj, base_cls=Dataset,
                               map_args=map_dataset_args,
                               exclude_args=['pre_filter'])
        except (ValueError, TypeError):
            continue
        store.store(cls_name, group='dataset', node=cls)

    from pytorch_geometric_tpu.nn.models import basic_gnn
    for cls_name in sorted(getattr(basic_gnn, '__all__',
                                   ['GCN', 'GraphSAGE', 'GIN', 'GAT',
                                    'PNA', 'EdgeCNN'])):
        obj = getattr(basic_gnn, cls_name, None)
        if obj is None or not inspect.isclass(obj):
            continue
        store.store(cls_name, group='model',
                    node=to_dataclass(obj, base_cls=Model))

    import optax
    for fn_name in ['adam', 'adamw', 'sgd', 'rmsprop', 'adagrad',
                    'lamb', 'lion', 'adafactor', 'novograd', 'radam']:
        fn = getattr(optax, fn_name, None)
        if fn is None:
            continue
        store.store(fn_name, group='optimizer',
                    node=to_dataclass(fn, base_cls=Optimizer,
                                      with_target=True))
    for fn_name in ['constant_schedule', 'cosine_decay_schedule',
                    'exponential_decay', 'linear_schedule',
                    'piecewise_constant_schedule', 'warmup_cosine_decay_schedule']:
        fn = getattr(optax, fn_name, None)
        if fn is None:
            continue
        store.store(fn_name, group='lr_scheduler',
                    node=to_dataclass(fn, base_cls=LRScheduler,
                                      with_target=True))

    store.store('config', node=Config)
