"""Reference store mocks (reference ``testing/feature_store.py`` /
``testing/graph_store.py`` — `MyFeatureStore`/`MyGraphStore` validate
the FeatureStore/GraphStore ABCs in tests and docs)."""

from ..data.stores import InMemoryFeatureStore, InMemoryGraphStore

__all__ = ['MyFeatureStore', 'MyGraphStore']


class MyFeatureStore(InMemoryFeatureStore):
    """Dict-backed FeatureStore used to exercise the ABC in tests."""


class MyGraphStore(InMemoryGraphStore):
    """Dict-backed GraphStore used to exercise the ABC in tests."""
