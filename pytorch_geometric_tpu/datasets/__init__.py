from .fake import FakeDataset, planetoid_like
from .generators import (KarateClub, StochasticBlockModelDataset,
                         ExplainerDataset, FakeHeteroDataset, ba_graph)
from .planetoid import Planetoid
from .tu_dataset import TUDataset
from .npz_datasets import (Amazon, Coauthor, WebKB, WikipediaNetwork,
                           Actor, read_npz)
from .geometry import (ModelNet, FAUST, MD17, QM9, MovieLens,
                       JODIEDataset, parse_sdf)

__all__ = [
    'FakeDataset', 'planetoid_like', 'KarateClub',
    'StochasticBlockModelDataset', 'ExplainerDataset', 'FakeHeteroDataset',
    'ba_graph', 'Planetoid', 'TUDataset', 'Amazon', 'Coauthor', 'WebKB',
    'WikipediaNetwork', 'Actor', 'read_npz', 'ModelNet', 'FAUST', 'MD17',
    'QM9', 'MovieLens', 'JODIEDataset', 'parse_sdf',
]
