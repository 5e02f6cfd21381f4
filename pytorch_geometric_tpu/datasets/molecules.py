"""Molecular / benchmark-suite datasets.

Reference: ``torch_geometric/datasets/`` — zinc.py, aqsol.py,
molecule_net.py (csv of SMILES; rdkit-gated featurization),
gnn_benchmark_dataset.py, mnist_superpixels.py, lrgb.py, qm7.py,
malnet_tiny.py, upfd.py, ged_dataset.py. Pickle-based raws load
through ``torch.load``/``pickle`` (torch-cpu is in the image).
Zero-egress: raw files go in ``root/raw``.
"""

import os.path as osp
import pickle
from typing import Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import InMemoryDataset


def _tolist(mol_graphs):
    """(num_atoms x F, [2, E], y) tuples -> Data list."""
    out = []
    for x, coo, y in mol_graphs:
        out.append(Data(x=np.asarray(x, np.float32),
                        edge_index=np.asarray(coo, np.int64),
                        y=np.asarray(y)))
    return out


class ZINC(InMemoryDataset):
    """ZINC molecular graphs (reference ``zinc.py`` — pickled dicts
    with ``atom_type``/``bond_type``/``logP_SA_cycle_normalized``)."""

    def __init__(self, root: str, subset: bool = False,
                 split: str = 'train', **kwargs):
        self.subset = subset
        self.split = split
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.split}.pickle']

    @property
    def processed_file_names(self) -> Sequence[str]:
        tag = 'subset' if self.subset else 'full'
        return [f'{self.split}_{tag}.npz']

    def process(self):
        with open(osp.join(self.raw_dir, self.raw_file_names[0]),
                  'rb') as f:
            mols = pickle.load(f)
        if self.subset:
            mols = mols[:1000]
        out = []
        for mol in mols:
            x = np.asarray(mol['atom_type']).reshape(-1, 1) \
                .astype(np.float32)
            adj = np.asarray(mol['bond_type'])
            r, c = np.nonzero(adj)
            d = Data(x=x, edge_index=np.stack([r, c]).astype(np.int64),
                     edge_attr=adj[r, c].astype(np.float32),
                     y=np.asarray(mol['logP_SA_cycle_normalized'],
                                  np.float32).reshape(-1))
            out.append(d)
        self.save(out)


class AQSOL(ZINC):
    """Aqueous solubility (reference ``aqsol.py`` — pickled
    (x, edge_attr, edge_index, y) tuples)."""

    def process(self):
        with open(osp.join(self.raw_dir, self.raw_file_names[0]),
                  'rb') as f:
            mols = pickle.load(f)
        out = []
        for x, ea, coo, y in mols:
            out.append(Data(
                x=np.asarray(x, np.float32).reshape(len(x), -1),
                edge_index=np.asarray(coo, np.int64),
                edge_attr=np.asarray(ea, np.float32),
                y=np.asarray([y], np.float32)))
        self.save(out)


class MoleculeNet(InMemoryDataset):
    """MoleculeNet csv benchmarks (reference ``molecule_net.py``).
    Featurization uses rdkit when present; otherwise falls back to a
    character-level SMILES bag-of-symbols (documented deviation —
    rdkit is absent in this image)."""

    # (csv name, smiles column, label columns)
    names = {
        'esol': ('delaney-processed.csv', -1, slice(1, 2)),
        'freesolv': ('SAMPL.csv', 1, slice(2, 3)),
        'lipo': ('Lipophilicity.csv', 2, slice(1, 2)),
        'hiv': ('HIV.csv', 0, slice(2, 3)),
        'bace': ('bace.csv', 0, slice(2, 3)),
    }

    def __init__(self, root: str, name: str, **kwargs):
        self.name = name.lower()
        super().__init__(osp.join(root, self.name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [self.names[self.name][0]]

    def process(self):
        import csv
        fname, smi_col, y_cols = self.names[self.name]
        out = []
        with open(osp.join(self.raw_dir, fname)) as f:
            reader = csv.reader(f)
            next(reader)
            for row in reader:
                smiles = row[smi_col]
                try:
                    from ..utils.misc import from_rdmol
                    from rdkit import Chem
                    d = from_rdmol(Chem.MolFromSmiles(smiles))
                except ImportError:
                    d = self._smiles_fallback(smiles)
                ys = [float(v) if v else float('nan')
                      for v in row[y_cols]]
                d.y = np.asarray([ys], np.float32)
                d.smiles = np.frombuffer(
                    smiles.encode()[:64].ljust(64), np.uint8).copy()
                out.append(d)
        self.save(out)

    @staticmethod
    def _smiles_fallback(smiles: str) -> Data:
        atoms = [c for c in smiles if c.isalpha()]
        n = max(len(atoms), 1)
        x = np.zeros((n, 32), np.float32)
        for i, a in enumerate(atoms[:n]):
            x[i, ord(a.lower()) % 32] = 1
        # chain graph as the topology fallback
        if n > 1:
            r = np.arange(n - 1)
            coo = np.concatenate(
                [np.stack([r, r + 1]), np.stack([r + 1, r])], 1)
        else:
            coo = np.zeros((2, 0), np.int64)
        return Data(x=x, edge_index=coo.astype(np.int64))


class GNNBenchmarkDataset(InMemoryDataset):
    """CLUSTER/PATTERN/MNIST/CIFAR10 (reference
    ``gnn_benchmark_dataset.py`` — torch .pt payloads)."""

    def __init__(self, root: str, name: str, split: str = 'train',
                 **kwargs):
        self.name = name
        self.split = split
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.name}.pt']

    @property
    def processed_file_names(self) -> Sequence[str]:
        return [f'{self.split}.npz']

    def process(self):
        import torch
        payload = torch.load(osp.join(self.raw_dir,
                                      self.raw_file_names[0]),
                             weights_only=False)
        split_ix = {'train': 0, 'val': 1, 'test': 2}[self.split]
        graphs = payload[split_ix]
        out = []
        for g in graphs:
            kw = {}
            for key in ('x', 'edge_index', 'edge_attr', 'y', 'pos'):
                v = g.get(key) if isinstance(g, dict) \
                    else getattr(g, key, None)
                if v is not None:
                    kw[key] = np.asarray(v)
            out.append(Data(**kw))
        self.save(out)


class MNISTSuperpixels(GNNBenchmarkDataset):
    """(reference ``mnist_superpixels.py``)."""

    def __init__(self, root: str, train: bool = True, **kwargs):
        InMemoryDataset.__init__(self, root, **kwargs)
        self.split = 'train' if train else 'test'

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['MNISTSuperpixels.pt']

    def process(self):
        import torch
        payload = torch.load(osp.join(self.raw_dir,
                                      self.raw_file_names[0]),
                             weights_only=False)
        graphs = payload[0 if self.split == 'train' else 1]
        out = []
        for g in graphs:
            kw = {k: np.asarray(v) for k, v in
                  (g.items() if isinstance(g, dict) else [])}
            out.append(Data(**kw))
        self.save(out)


class LRGBDataset(InMemoryDataset):
    """Long-Range Graph Benchmark (reference ``lrgb.py`` — pickled
    split lists of (x, edge_attr, edge_index, y))."""

    def __init__(self, root: str, name: str, split: str = 'train',
                 **kwargs):
        self.name = name
        self.split = split
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.split}.pickle']

    @property
    def processed_file_names(self) -> Sequence[str]:
        return [f'{self.split}.npz']

    def process(self):
        with open(osp.join(self.raw_dir, self.raw_file_names[0]),
                  'rb') as f:
            graphs = pickle.load(f)
        out = []
        for g in graphs:
            x, ea, coo, y = g
            out.append(Data(
                x=np.asarray(x, np.float32),
                edge_index=np.asarray(coo, np.int64),
                edge_attr=np.asarray(ea, np.float32),
                y=np.asarray(y)))
        self.save(out)


class MalNetTiny(InMemoryDataset):
    """Function-call graphs (reference ``malnet_tiny.py`` — per-graph
    edgelist files listed in split files)."""

    def __init__(self, root: str, split: str = 'train', **kwargs):
        self.split = split
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.split}.txt']

    @property
    def processed_file_names(self) -> Sequence[str]:
        return [f'{self.split}.npz']

    def process(self):
        out = []
        with open(osp.join(self.raw_dir, self.raw_file_names[0])) as f:
            entries = [l.strip().split() for l in f if l.strip()]
        for path, label in entries:
            coo = np.genfromtxt(osp.join(self.raw_dir, path),
                                dtype=np.int64, comments='#').T
            n = int(coo.max()) + 1 if coo.size else 1
            out.append(Data(edge_index=coo.astype(np.int64),
                            y=np.asarray([int(label)]), num_nodes=n))
        self.save(out)
