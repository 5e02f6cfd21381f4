from .fake import FakeDataset, planetoid_like
from .generators import (KarateClub, StochasticBlockModelDataset,
                         ExplainerDataset, FakeHeteroDataset, ba_graph)
from .planetoid import Planetoid
from .tu_dataset import TUDataset

__all__ = [
    'FakeDataset', 'planetoid_like', 'KarateClub',
    'StochasticBlockModelDataset', 'ExplainerDataset', 'FakeHeteroDataset',
    'ba_graph', 'Planetoid', 'TUDataset',
]
