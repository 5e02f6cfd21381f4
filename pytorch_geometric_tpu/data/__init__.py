from .data import Data
from .batch import Batch
from .hetero_data import HeteroData
from .dataset import Dataset, InMemoryDataset
from .hypergraph import HypergraphData
from .temporal import TemporalData
from .summary import Summary, Stats, summary
from .database import (Database, SQLiteDatabase, RocksDatabase,
                       OnDiskDataset, TensorInfo)
from .download import download_url, download_google_url
from .extract import extract_tar, extract_zip, extract_bz2, extract_gz
from .stores import (FeatureStore, GraphStore, InMemoryFeatureStore,
                     InMemoryGraphStore, TensorAttr, EdgeAttr, EdgeLayout)
from ..io.fs import makedirs
from ..deprecation import deprecated, LazyLoader

__all__ = [
    'LightningDataModule', 'LightningDataset', 'LightningNodeData',
    'LightningLinkData', 'DatasetAdapter', 'Batcher',
    'functional_transform', 'HeteroBatch','Data', 'Batch', 'HeteroData', 'Dataset', 'InMemoryDataset',
           'FeatureStore', 'GraphStore', 'InMemoryFeatureStore',
           'InMemoryGraphStore', 'TensorAttr', 'EdgeAttr', 'EdgeLayout',
           'Database', 'SQLiteDatabase', 'RocksDatabase', 'OnDiskDataset',
           'TensorInfo', 'TemporalData',
           'download_url', 'download_google_url', 'makedirs',
           'extract_tar', 'extract_zip', 'extract_bz2', 'extract_gz',
           'Summary', 'Stats', 'summary', 'HypergraphData']

# Deprecated loader aliases the reference still re-exports from
# torch_geometric.data (data/__init__.py:60-73). Resolved lazily to
# avoid a circular import (loader imports data).
_LOADER_ALIASES = (
    'NeighborSampler', 'ClusterData', 'ClusterLoader', 'GraphSAINTSampler',
    'GraphSAINTNodeSampler', 'GraphSAINTEdgeSampler',
    'GraphSAINTRandomWalkSampler', 'ShaDowKHopSampler', 'RandomNodeLoader',
    'DataLoader', 'DataListLoader', 'DenseDataLoader')


def __getattr__(name):
    if name in _LOADER_ALIASES:
        from .. import loader
        return getattr(loader, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}")
from .lightning import (LightningDataModule, LightningDataset,
                        LightningNodeData, LightningLinkData)
from .datapipes import DatasetAdapter, Batcher, functional_transform
from .hetero_batch import HeteroBatch
