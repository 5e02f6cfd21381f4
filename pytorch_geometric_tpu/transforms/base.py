"""BaseTransform + Compose (reference
``torch_geometric/transforms/base_transform.py`` and ``compose.py``).

Transforms are host-side graph rewrites: Data in -> Data out (our Data is
immutable, so every transform returns a new Data via ``replace``).
"""

from typing import Callable, List, Sequence, Union

from ..data import Data


class BaseTransform:
    def __call__(self, data):
        raise NotImplementedError

    def __repr__(self):
        return f'{self.__class__.__name__}()'


class Compose(BaseTransform):
    """Chain transforms (reference ``compose.py``)."""

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data

    def __repr__(self):
        args = ', '.join(repr(t) for t in self.transforms)
        return f'Compose([{args}])'
