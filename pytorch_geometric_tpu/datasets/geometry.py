"""Mesh / point-cloud / molecular / temporal dataset loaders.

Reference: ``torch_geometric/datasets/modelnet.py``, ``faust.py``,
``md17.py``, ``qm9.py``, ``movie_lens.py``, ``jodie.py``. Zero-egress:
raw files must be present under ``root/raw`` (same layout as the
reference's extracted downloads).
"""

import glob
import os.path as osp
from typing import Optional, Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import InMemoryDataset
from ..data.hetero_data import HeteroData


class ModelNet(InMemoryDataset):
    """ModelNet10/40 OFF meshes (reference ``datasets/modelnet.py``)."""

    def __init__(self, root: str, name: str = '10', train: bool = True,
                 **kwargs):
        self.name = name
        self.split = 'train' if train else 'test'
        super().__init__(osp.join(root, f'modelnet{name}_{self.split}'),
                         **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['']  # presence validated in process()

    def _maybe_download(self):
        pass

    def process(self):
        from ..io import read_off
        data_list = []
        categories = sorted(
            osp.basename(p)
            for p in glob.glob(osp.join(self.raw_dir, '*'))
            if osp.isdir(p))
        if not categories:
            raise RuntimeError(
                f'ModelNet raw OFF folders missing under {self.raw_dir} '
                f'(no network egress — place them manually)')
        for label, cat in enumerate(categories):
            for path in sorted(glob.glob(
                    osp.join(self.raw_dir, cat, self.split, '*.off'))):
                d = read_off(path)
                data_list.append(d.replace(y=np.array([label])))
        self.save(data_list)


class FAUST(InMemoryDataset):
    """FAUST scans (reference ``datasets/faust.py``; PLY meshes)."""

    def __init__(self, root: str, train: bool = True, **kwargs):
        self.train = train
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['MPI-FAUST']

    def process(self):
        from ..io import read_ply
        paths = sorted(glob.glob(osp.join(
            self.raw_dir, 'MPI-FAUST', 'training', 'registrations',
            '*.ply')))
        data_list = []
        for i, p in enumerate(paths):
            d = read_ply(p)
            data_list.append(d.replace(y=np.array([i % 10])))
        sel = data_list[:80] if self.train else data_list[80:]
        self.save(sel)


class MD17(InMemoryDataset):
    """MD17 molecular dynamics (reference ``datasets/md17.py``; npz with
    z/R/E/F arrays)."""

    def __init__(self, root: str, name: str, **kwargs):
        self.name = name
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.name}.npz']

    def process(self):
        with np.load(osp.join(self.raw_dir, self.raw_file_names[0]),
                     allow_pickle=True) as f:
            z = f['z'].astype(np.int32)
            pos = f['R'].astype(np.float32)
            energy = f['E'].astype(np.float32).reshape(-1)
            force = f['F'].astype(np.float32)
        data_list = [
            # reference md17.py:430: per-frame `energy`/`force` attrs
            # (y kept as an alias for training convenience)
            Data(z=z, pos=pos[i], y=np.array([energy[i]]),
                 energy=np.array(energy[i], np.float32),
                 force=force[i], num_nodes=len(z))
            for i in range(min(len(pos), 10000))
        ]
        self.save(data_list)


# minimal periodic table for SDF parsing (QM9 only uses HCNOF)
_SYMBOLS = {'H': 1, 'C': 6, 'N': 7, 'O': 8, 'F': 9}
_BOND_TYPES = {'1': 0, '2': 1, '3': 2, '4': 3}  # single/double/triple/aromatic


def parse_sdf(src: str) -> Data:
    """Parse one SDF molecule block (reference ``io/sdf.py:parse_sdf``)."""
    lines = src.split('\n')
    counts = lines[3].split()
    num_atoms, num_bonds = int(counts[0]), int(counts[1])
    pos, z = [], []
    for line in lines[4:4 + num_atoms]:
        parts = line.split()
        pos.append([float(v) for v in parts[:3]])
        z.append(_SYMBOLS.get(parts[3], 0))
    rows, cols, types = [], [], []
    for line in lines[4 + num_atoms:4 + num_atoms + num_bonds]:
        parts = line.split()
        a, b = int(parts[0]) - 1, int(parts[1]) - 1
        t = _BOND_TYPES.get(parts[2], 0)
        rows += [a, b]
        cols += [b, a]
        types += [t, t]
    edge_index = (np.stack([rows, cols]).astype(np.int32)
                  if rows else np.zeros((2, 0), np.int32))
    edge_attr = np.eye(4, dtype=np.float32)[types] if types else \
        np.zeros((0, 4), np.float32)
    return Data(z=np.array(z, np.int32),
                pos=np.array(pos, np.float32),
                edge_index=edge_index, edge_attr=edge_attr,
                num_nodes=num_atoms)


class QM9(InMemoryDataset):
    """QM9 molecules (reference ``datasets/qm9.py``; rdkit-free SDF
    parsing of ``gdb9.sdf`` + targets csv)."""

    def __init__(self, root: str, **kwargs):
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['gdb9.sdf', 'gdb9.sdf.csv']

    def process(self):
        with open(osp.join(self.raw_dir, 'gdb9.sdf')) as f:
            blocks = f.read().split('$$$$\n')
        import csv
        targets = []
        with open(osp.join(self.raw_dir, 'gdb9.sdf.csv')) as f:
            reader = csv.reader(f)
            header = next(reader)
            for row in reader:
                targets.append([float(v) for v in row[1:]])
        data_list = []
        for i, block in enumerate(blocks):
            if not block.strip() or i >= len(targets):
                continue
            d = parse_sdf(block)
            data_list.append(d.replace(
                y=np.array(targets[i], np.float32)[None]))
        self.save(data_list)


class MovieLens(InMemoryDataset):
    """MovieLens-100k style hetero dataset (reference
    ``datasets/movie_lens.py``): users rate movies."""

    def __init__(self, root: str, **kwargs):
        self._hetero: Optional[HeteroData] = None
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['ratings.csv']

    @property
    def processed_file_names(self) -> Sequence[str]:
        return ['hetero.npz']

    def process(self):
        import csv
        users, movies = {}, {}
        src, dst, rating = [], [], []
        with open(osp.join(self.raw_dir, 'ratings.csv')) as f:
            reader = csv.reader(f)
            next(reader)
            for row in reader:
                u, m, r = row[0], row[1], float(row[2])
                users.setdefault(u, len(users))
                movies.setdefault(m, len(movies))
                src.append(users[u])
                dst.append(movies[m])
                rating.append(r)
        np.savez(osp.join(self.processed_dir, 'hetero.npz'),
                 src=np.array(src, np.int64),
                 dst=np.array(dst, np.int64),
                 rating=np.array(rating, np.float32),
                 num_users=len(users), num_movies=len(movies))

    def _load_hetero(self) -> HeteroData:
        if self._hetero is None:
            z = np.load(osp.join(self.processed_dir, 'hetero.npz'))
            data = HeteroData()
            data['user'].num_nodes_hint = int(z['num_users'])
            data['user'].x = np.eye(int(z['num_users']),
                                    dtype=np.float32)
            data['movie'].x = np.eye(int(z['num_movies']),
                                     dtype=np.float32)
            coo = np.stack([z['src'], z['dst']]).astype(np.int32)
            data['user', 'rates', 'movie'].edge_index = coo
            data['user', 'rates', 'movie'].edge_label = z['rating']
            self._hetero = data
        return self._hetero

    def len(self):
        return 1

    def get(self, idx):
        return self._load_hetero()


class JODIEDataset(InMemoryDataset):
    """JODIE temporal interaction csv (reference ``datasets/jodie.py``):
    user, item, timestamp, state_label, features..."""

    def __init__(self, root: str, name: str, **kwargs):
        self.name = name
        self._events = None
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.name}.csv']

    @property
    def processed_file_names(self) -> Sequence[str]:
        return ['events.npz']

    def process(self):
        import csv
        src, dst, t, msgs, y = [], [], [], [], []
        with open(osp.join(self.raw_dir,
                           self.raw_file_names[0])) as f:
            reader = csv.reader(f)
            next(reader)
            for row in reader:
                src.append(int(row[0]))
                dst.append(int(row[1]))
                t.append(float(row[2]))
                y.append(float(row[3]))
                msgs.append([float(v) for v in row[4:]])
        src = np.array(src, np.int64)
        dst = np.array(dst, np.int64) + (src.max() + 1)
        # reference jodie.py casts t and y to long (timestamps are
        # truncated to integers; state labels are class ids)
        np.savez(osp.join(self.processed_dir, 'events.npz'),
                 src=src, dst=dst,
                 t=np.array(t, np.float64).astype(np.int64),
                 y=np.array(y, np.float64).astype(np.int64),
                 msg=np.array(msgs, np.float32))

    def _load(self):
        if self._events is None:
            from ..nn.models.tgn import TemporalData
            z = np.load(osp.join(self.processed_dir, 'events.npz'))
            self._events = TemporalData(z['src'], z['dst'], z['t'],
                                        z['msg'], z['y'])
        return self._events

    def len(self):
        return 1

    def get(self, idx):
        return self._load()
