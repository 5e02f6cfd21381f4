from .data import Data
from .batch import Batch
from .hetero_data import HeteroData
from .dataset import Dataset, InMemoryDataset
from .hypergraph import HypergraphData
from .summary import Summary, Stats, summary
from .database import Database, SQLiteDatabase, OnDiskDataset, TensorInfo
from .stores import (FeatureStore, GraphStore, InMemoryFeatureStore,
                     InMemoryGraphStore, TensorAttr, EdgeAttr, EdgeLayout)

__all__ = [
    'LightningDataModule', 'LightningDataset', 'LightningNodeData',
    'LightningLinkData', 'DatasetAdapter', 'Batcher',
    'functional_transform', 'HeteroBatch','Data', 'Batch', 'HeteroData', 'Dataset', 'InMemoryDataset',
           'FeatureStore', 'GraphStore', 'InMemoryFeatureStore',
           'InMemoryGraphStore', 'TensorAttr', 'EdgeAttr', 'EdgeLayout',
           'Database', 'SQLiteDatabase', 'OnDiskDataset', 'TensorInfo',
           'Summary', 'Stats', 'summary', 'HypergraphData']
from .lightning import (LightningDataModule, LightningDataset,
                        LightningNodeData, LightningLinkData)
from .datapipes import DatasetAdapter, Batcher, functional_transform
from .hetero_batch import HeteroBatch
