"""config_store / config_mixin (reference ``torch_geometric/config_store.py``,
``config_mixin.py``): schema generation, global store, round trips."""
from dataclasses import asdict, is_dataclass

import pytest

from pytorch_geometric_tpu.config_mixin import ConfigMixin
from pytorch_geometric_tpu.config_store import (
    class_from_dataclass, clear_config_store, dataclass_from_class,
    fill_config_store, get_config_store, register, to_dataclass)


@pytest.fixture(autouse=True)
def _fresh_store():
    clear_config_store()
    yield
    clear_config_store()


def test_to_dataclass_schema():
    from pytorch_geometric_tpu.transforms import NormalizeFeatures
    schema = to_dataclass(NormalizeFeatures, with_target=True)
    inst = schema()
    d = asdict(inst)
    assert list(d['attrs']) == ['x']
    assert d['_target_'].endswith('NormalizeFeatures')


def test_register_and_lookup():
    class MyThing:
        def __init__(self, k: int = 3):
            self.k = k

    data_cls = register(MyThing, group='model')
    assert is_dataclass(data_cls)
    assert dataclass_from_class(MyThing) is data_cls
    assert class_from_dataclass(data_cls) is MyThing
    with pytest.raises(ValueError, match='already registered'):
        register(MyThing, group='model')


def test_register_as_decorator():
    @register(group='transform')
    class Dec(ConfigMixin):
        def __init__(self, p: float = 0.5):
            self.p = p

    cfg = Dec(p=0.25).config()
    assert cfg.p == 0.25
    new = Dec.from_config(cfg)
    assert isinstance(new, Dec) and new.p == 0.25


def test_config_mixin_dict_target_roundtrip():
    class Inner(ConfigMixin):
        def __init__(self, n: int = 1):
            self.n = n

    register(Inner, group='model')
    cfg = {'_target_': f'{__name__}.does.not.matter', 'n': 9}
    # _target_ dict path resolves via dataclass when import fails
    obj = Inner.from_config(Inner(n=9).config())
    assert obj.n == 9


def test_fill_config_store_catalog():
    fill_config_store()
    repo = get_config_store().repo
    assert len(repo['transform']) >= 50
    assert len(repo['dataset']) >= 90
    assert len(repo['model']) >= 5
    assert len(repo['optimizer']) >= 5
    assert len(repo['lr_scheduler']) >= 4
    assert 'config' in repo
    # optax factory schema instantiates with defaults intact
    adam = repo['optimizer']['adam'].node
    inst = adam()
    assert hasattr(inst, 'learning_rate')
