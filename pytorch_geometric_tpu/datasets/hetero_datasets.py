"""Heterogeneous benchmark datasets.

Reference: ``torch_geometric/datasets/`` — dblp.py, imdb.py,
last_fm.py, aminer.py, movie_lens_100k.py, movie_lens_1m.py,
taobao.py, ogb_mag.py, hgb_dataset.py. DBLP/IMDB/LastFM ship
pickled scipy matrices + npy splits; MovieLens ships csv/dat;
Taobao a csv event log; OGB_MAG the OGB npz layout.
Zero-egress: raw files go in ``root/raw``.
"""

import os.path as osp
from typing import Sequence

import numpy as np

from ..data.hetero_data import HeteroData
from ..data.dataset import InMemoryDataset, Dataset


class _HeteroInMemory(Dataset):
    """Single-HeteroData dataset helper (hetero graphs don't go through
    the homogeneous npz collation; kept in memory after process())."""

    def __init__(self, root: str, transform=None, pre_transform=None):
        import os
        self.root = root
        self.transform = transform
        self.pre_transform = pre_transform
        self.pre_filter = None
        self._data = None
        os.makedirs(self.raw_dir, exist_ok=True)
        missing = [f for f in self.raw_file_names
                   if not osp.exists(osp.join(self.raw_dir, f))]
        if missing:
            raise FileNotFoundError(
                f'{type(self).__name__}: raw files {missing} not found '
                f'under {self.raw_dir} (zero-egress environment: '
                f'place them there manually)')
        self.process()

    @property
    def raw_dir(self):
        return osp.join(self.root, 'raw')

    @property
    def raw_file_names(self) -> Sequence[str]:
        return []

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        d = self._data
        return d if self.transform is None else self.transform(d)


class DBLP(_HeteroInMemory):
    """4-type citation network (reference ``dblp.py``): author/paper/
    term/conference; features as pickled scipy npz, labels + splits
    npy/npz."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['adjM.npz', 'features_0.npz', 'features_1.npz',
                'features_2.npy', 'labels.npy', 'train_val_test_idx.npz']

    def process(self):
        import scipy.sparse as sp
        raw = self.raw_dir
        d = HeteroData()
        d['author'].x = np.asarray(
            sp.load_npz(osp.join(raw, 'features_0.npz')).todense(),
            np.float32)
        d['paper'].x = np.asarray(
            sp.load_npz(osp.join(raw, 'features_1.npz')).todense(),
            np.float32)
        d['term'].x = np.load(osp.join(raw, 'features_2.npy')) \
            .astype(np.float32)
        d['author'].y = np.load(osp.join(raw, 'labels.npy')) \
            .astype(np.int32)
        split = np.load(osp.join(raw, 'train_val_test_idx.npz'))
        n_a = d['author'].x.shape[0]
        for name, key in (('train', 'train_idx'), ('val', 'val_idx'),
                          ('test', 'test_idx')):
            mask = np.zeros(n_a, bool)
            mask[split[key]] = True
            setattr(d['author'], f'{name}_mask', mask)
        adj = sp.load_npz(osp.join(raw, 'adjM.npz')).tocoo()
        n_p = d['paper'].x.shape[0]
        n_t = d['term'].x.shape[0]
        # block layout: [author | paper | term | conf]
        offs = [0, n_a, n_a + n_p, n_a + n_p + n_t]
        n_c = adj.shape[0] - offs[3]
        d['conference'].num_nodes = n_c
        d['conference'].x = np.eye(max(n_c, 1), dtype=np.float32)
        names = ['author', 'paper', 'term', 'conference']
        bounds = offs + [adj.shape[0]]

        def block_of(i):
            for b in range(4):
                if i < bounds[b + 1]:
                    return b
        rows, cols = adj.row, adj.col
        rb = np.searchsorted(bounds[1:], rows, side='right')
        cb = np.searchsorted(bounds[1:], cols, side='right')
        for bi in range(4):
            for bj in range(4):
                m = (rb == bi) & (cb == bj)
                if not m.any() or bi == bj:
                    continue
                ei = np.stack([rows[m] - bounds[bi],
                               cols[m] - bounds[bj]])
                d[(names[bi], 'to', names[bj])].edge_index = \
                    ei.astype(np.int64)
        self._data = d


class IMDB(DBLP):
    """movie/director/actor network (reference ``imdb.py`` — same raw
    layout as DBLP with 3 typed features)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['adjM.npz', 'features_0.npz', 'features_1.npz',
                'features_2.npz', 'labels.npy',
                'train_val_test_idx.npz']

    def process(self):
        import scipy.sparse as sp
        raw = self.raw_dir
        d = HeteroData()
        names = ['movie', 'director', 'actor']
        for i, t in enumerate(names):
            d[t].x = np.asarray(
                sp.load_npz(osp.join(raw, f'features_{i}.npz'))
                .todense(), np.float32)
        d['movie'].y = np.load(osp.join(raw, 'labels.npy')) \
            .astype(np.int32)
        split = np.load(osp.join(raw, 'train_val_test_idx.npz'))
        n_m = d['movie'].x.shape[0]
        for name, key in (('train', 'train_idx'), ('val', 'val_idx'),
                          ('test', 'test_idx')):
            mask = np.zeros(n_m, bool)
            mask[split[key]] = True
            setattr(d['movie'], f'{name}_mask', mask)
        adj = sp.load_npz(osp.join(raw, 'adjM.npz')).tocoo()
        sizes = [d[t].x.shape[0] for t in names]
        bounds = np.cumsum([0] + sizes).tolist()
        rb = np.searchsorted(bounds[1:], adj.row, side='right')
        cb = np.searchsorted(bounds[1:], adj.col, side='right')
        for bi in range(3):
            for bj in range(3):
                m = (rb == bi) & (cb == bj)
                if not m.any() or bi == bj:
                    continue
                ei = np.stack([adj.row[m] - bounds[bi],
                               adj.col[m] - bounds[bj]])
                d[(names[bi], 'to', names[bj])].edge_index = \
                    ei.astype(np.int64)
        self._data = d


class MovieLens100K(_HeteroInMemory):
    """(reference ``movie_lens_100k.py`` — u.data / u.item / u.user)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['u.data', 'u.item', 'u.user']

    def process(self):
        raw = self.raw_dir
        ratings = np.genfromtxt(osp.join(raw, 'u.data'),
                                dtype=np.int64)
        users, items = set(), set()
        with open(osp.join(raw, 'u.user')) as f:
            n_users = sum(1 for _ in f)
        with open(osp.join(raw, 'u.item'), encoding='latin-1') as f:
            n_items = sum(1 for _ in f)
        d = HeteroData()
        d['user'].num_nodes = n_users
        d['user'].x = np.eye(n_users, dtype=np.float32)
        d['movie'].num_nodes = n_items
        d['movie'].x = np.eye(n_items, dtype=np.float32)
        src = ratings[:, 0] - 1
        dst = ratings[:, 1] - 1
        et = ('user', 'rates', 'movie')
        d[et].edge_index = np.stack([src, dst])
        d[et].edge_label = ratings[:, 2].astype(np.float32)
        d[et].time = ratings[:, 3]
        rev = ('movie', 'rated_by', 'user')
        d[rev].edge_index = np.stack([dst, src])
        self._data = d


class MovieLens1M(MovieLens100K):
    """(reference ``movie_lens_1m.py`` — ratings.dat '::'-separated)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['ratings.dat']

    def process(self):
        rows = []
        with open(osp.join(self.raw_dir, 'ratings.dat')) as f:
            for line in f:
                rows.append([int(v) for v in line.strip().split('::')])
        r = np.asarray(rows, np.int64)
        d = HeteroData()
        n_u = int(r[:, 0].max())
        n_m = int(r[:, 1].max())
        d['user'].num_nodes = n_u
        d['user'].x = np.eye(n_u, dtype=np.float32)
        d['movie'].num_nodes = n_m
        d['movie'].x = np.eye(n_m, dtype=np.float32)
        et = ('user', 'rates', 'movie')
        d[et].edge_index = np.stack([r[:, 0] - 1, r[:, 1] - 1])
        d[et].edge_label = r[:, 2].astype(np.float32)
        d[et].time = r[:, 3]
        self._data = d


class Taobao(_HeteroInMemory):
    """User behavior log (reference ``taobao.py`` — csv
    user,item,category,behaviour,timestamp)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['UserBehavior.csv']

    def process(self):
        rows = np.genfromtxt(osp.join(self.raw_dir, 'UserBehavior.csv'),
                             delimiter=',', dtype=np.int64,
                             usecols=(0, 1, 2, 4))
        u, inv_u = np.unique(rows[:, 0], return_inverse=True)
        i, inv_i = np.unique(rows[:, 1], return_inverse=True)
        c, inv_c = np.unique(rows[:, 2], return_inverse=True)
        d = HeteroData()
        d['user'].num_nodes = len(u)
        d['item'].num_nodes = len(i)
        d['category'].num_nodes = len(c)
        et = ('user', 'to', 'item')
        d[et].edge_index = np.stack([inv_u, inv_i])
        d[et].time = rows[:, 3]
        d[('item', 'to', 'category')].edge_index = np.unique(
            np.stack([inv_i, inv_c]), axis=1)
        self._data = d


class LastFM(_HeteroInMemory):
    """user/artist/tag (reference ``last_fm.py`` — HGB-style edge
    files)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['user_artist.txt', 'artist_tag.txt']

    def process(self):
        ua = np.genfromtxt(osp.join(self.raw_dir, 'user_artist.txt'),
                           dtype=np.int64)
        at = np.genfromtxt(osp.join(self.raw_dir, 'artist_tag.txt'),
                           dtype=np.int64)
        d = HeteroData()
        d['user'].num_nodes = int(ua[:, 0].max()) + 1
        d['artist'].num_nodes = int(max(ua[:, 1].max(),
                                        at[:, 0].max())) + 1
        d['tag'].num_nodes = int(at[:, 1].max()) + 1
        d[('user', 'to', 'artist')].edge_index = ua.T[:2]
        d[('artist', 'to', 'tag')].edge_index = at.T[:2]
        self._data = d


class AMiner(_HeteroInMemory):
    """author/paper/venue (reference ``aminer.py``)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['paper_author.txt', 'paper_conf.txt']

    def process(self):
        pa = np.genfromtxt(osp.join(self.raw_dir, 'paper_author.txt'),
                           dtype=np.int64)
        pc = np.genfromtxt(osp.join(self.raw_dir, 'paper_conf.txt'),
                           dtype=np.int64)
        d = HeteroData()
        d['paper'].num_nodes = int(max(pa[:, 0].max(),
                                       pc[:, 0].max())) + 1
        d['author'].num_nodes = int(pa[:, 1].max()) + 1
        d['venue'].num_nodes = int(pc[:, 1].max()) + 1
        d[('paper', 'written_by', 'author')].edge_index = pa.T[:2]
        d[('paper', 'published_in', 'venue')].edge_index = pc.T[:2]
        d[('author', 'writes', 'paper')].edge_index = pa.T[:2][::-1]
        self._data = d


class OGB_MAG(_HeteroInMemory):
    """ogbn-mag (reference ``ogb_mag.py``) from pre-extracted npz:
    paper features/labels/year + typed edge files."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['paper_feat.npy', 'paper_label.npy',
                'paper_cites_paper.npy', 'author_writes_paper.npy',
                'author_affiliated_institution.npy',
                'paper_has_topic_field.npy']

    def process(self):
        raw = self.raw_dir
        d = HeteroData()
        d['paper'].x = np.load(osp.join(raw, 'paper_feat.npy')) \
            .astype(np.float32)
        d['paper'].y = np.load(osp.join(raw, 'paper_label.npy')) \
            .astype(np.int32)
        pp = np.load(osp.join(raw, 'paper_cites_paper.npy'))
        ap = np.load(osp.join(raw, 'author_writes_paper.npy'))
        ai = np.load(osp.join(raw,
                              'author_affiliated_institution.npy'))
        pf = np.load(osp.join(raw, 'paper_has_topic_field.npy'))
        d['author'].num_nodes = int(max(ap[0].max(),
                                        ai[0].max())) + 1
        d['institution'].num_nodes = int(ai[1].max()) + 1
        d['field_of_study'].num_nodes = int(pf[1].max()) + 1
        d[('paper', 'cites', 'paper')].edge_index = pp
        d[('author', 'writes', 'paper')].edge_index = ap
        d[('author', 'affiliated_with',
           'institution')].edge_index = ai
        d[('paper', 'has_topic', 'field_of_study')].edge_index = pf
        self._data = d


class HGBDataset(_HeteroInMemory):
    """HGB benchmark family (reference ``hgb_dataset.py``) from the
    standard node.dat/link.dat layout: ``node.dat`` lines
    ``id\\tname\\ttype[\\tfeat,feat,...]``, ``link.dat`` lines
    ``src\\tdst\\tlink_type[\\tweight]``."""

    def __init__(self, root: str, name: str, **kwargs):
        self.name = name.lower()
        super().__init__(osp.join(root, self.name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['node.dat', 'link.dat', 'meta.dat']

    def process(self):
        raw = self.raw_dir
        with open(osp.join(raw, 'meta.dat')) as f:
            meta = [l.strip().split('\t') for l in f if l.strip()]
        type_names = {int(m[0]): m[1] for m in meta
                      if not m[0].startswith('e')}
        etype_meta = {int(m[0][1:]): (int(m[1]), int(m[2]))
                      for m in meta if m[0].startswith('e')}
        nodes = {}
        feats = {}
        with open(osp.join(raw, 'node.dat')) as f:
            for line in f:
                parts = line.rstrip('\n').split('\t')
                nid, t = int(parts[0]), int(parts[2])
                nodes.setdefault(t, []).append(nid)
                if len(parts) > 3:
                    feats.setdefault(t, []).append(
                        [float(v) for v in parts[3].split(',')])
        remap = {}
        d = HeteroData()
        for t, ids in nodes.items():
            name = type_names.get(t, f'type{t}')
            remap[t] = {g: i for i, g in enumerate(ids)}
            d[name].num_nodes = len(ids)
            if t in feats:
                d[name].x = np.asarray(feats[t], np.float32)
        with open(osp.join(raw, 'link.dat')) as f:
            links = {}
            for line in f:
                s, t, lt = line.split('\t')[:3]
                links.setdefault(int(lt), []).append((int(s), int(t)))
        for lt, pairs in links.items():
            st, dt = etype_meta.get(lt, (0, 0))
            sn = type_names.get(st, f'type{st}')
            dn = type_names.get(dt, f'type{dt}')
            ei = np.asarray([[remap[st][a], remap[dt][b]]
                             for a, b in pairs]).T
            d[(sn, f'rel{lt}', dn)].edge_index = ei
        self._data = d
