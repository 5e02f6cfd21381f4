"""Remaining dataset tail: recommendation, finance, QA, misc.

Reference: ``torch_geometric/datasets/`` — amazon_book.py (txt
user-item lists), hm.py (csv), city_network.py, dgraph.py (npz),
elliptic_temporal.py, ged_dataset.py, brca_tgca.py, cwq.py / web_qsp
(json QA triples), dbp15k.py (triples + alignments), upfd.py,
suite_sparse.py (mat), igmc_dataset.py, omdb.py, pcqm4m.py
(smiles csv), opf.py / hydro_net.py / neurograph.py / os_egvcs.py /
graphland.py / tag_dataset.py / protein_mpnn.py /
cornell.py (hypergraph csv) / git_mol / instruct_mol / molecule_gpt
(molecule-text csv). Zero-egress: raws under ``root/raw``.
"""

import json
import os.path as osp
from typing import Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import InMemoryDataset
from ..data.hetero_data import HeteroData
from .hetero_datasets import _HeteroInMemory


class AmazonBook(_HeteroInMemory):
    """User-book interactions (reference ``amazon_book.py`` —
    train.txt/test.txt lines ``user item item ...``)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['train.txt', 'test.txt']

    def process(self):
        d = HeteroData()
        edges = {'train': [], 'test': []}
        n_u = n_b = 0
        for split in ('train', 'test'):
            with open(osp.join(self.raw_dir, f'{split}.txt')) as f:
                for line in f:
                    vals = [int(v) for v in line.split()]
                    if not vals:
                        continue
                    u, items = vals[0], vals[1:]
                    n_u = max(n_u, u + 1)
                    for b in items:
                        n_b = max(n_b, b + 1)
                        edges[split].append((u, b))
        d['user'].num_nodes = n_u
        d['book'].num_nodes = n_b
        for split in ('train', 'test'):
            e = np.asarray(edges[split], np.int64).T \
                if edges[split] else np.zeros((2, 0), np.int64)
            et = ('user', 'rates', 'book')
            if split == 'train':
                d[et].edge_index = e
            else:
                d[et].edge_label_index = e
        self._data = d


class HM(_HeteroInMemory):
    """H&M transactions (reference ``hm.py`` — csv)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['transactions_train.csv']

    def process(self):
        import csv
        users, items, rows = {}, {}, []
        with open(osp.join(self.raw_dir, self.raw_file_names[0])) as f:
            reader = csv.reader(f)
            header = next(reader)
            for r in reader:
                u = users.setdefault(r[1], len(users))
                i = items.setdefault(r[2], len(items))
                rows.append((u, i, float(r[3]) if len(r) > 3 else 0.0))
        d = HeteroData()
        d['customer'].num_nodes = len(users)
        d['article'].num_nodes = len(items)
        arr = np.asarray(rows)
        et = ('customer', 'buys', 'article')
        d[et].edge_index = arr[:, :2].T.astype(np.int64)
        d[et].edge_attr = arr[:, 2:].astype(np.float32)
        self._data = d


class CityNetwork(InMemoryDataset):
    """City road networks (reference ``city_network.py`` — edge csv +
    feature/label npy)."""

    def __init__(self, root: str, name: str = 'paris', **kwargs):
        self.name = name
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['edges.csv', 'x.npy', 'y.npy']

    def process(self):
        coo = np.genfromtxt(osp.join(self.raw_dir, 'edges.csv'),
                            delimiter=',', dtype=np.int64,
                            skip_header=1).T
        x = np.load(osp.join(self.raw_dir, 'x.npy')).astype(np.float32)
        y = np.load(osp.join(self.raw_dir, 'y.npy'))
        self.save([Data(x=x, edge_index=coo, y=y,
                        num_nodes=x.shape[0])])


class DGraphFin(InMemoryDataset):
    """Financial fraud graph (reference ``dgraph.py`` — one npz)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['dgraphfin.npz']

    def process(self):
        with np.load(osp.join(self.raw_dir, self.raw_file_names[0])) \
                as f:
            x = f['x'].astype(np.float32)
            y = f['y'].astype(np.int32)
            coo = f['edge_index'].T.astype(np.int64) \
                if f['edge_index'].shape[0] != 2 else f['edge_index']
            d = Data(x=x, edge_index=coo, y=y, num_nodes=x.shape[0])
            for k in ('train_mask', 'valid_mask', 'test_mask'):
                if k in f:
                    idx = f[k]
                    mask = np.zeros(x.shape[0], bool)
                    mask[idx] = True
                    d[k.replace('valid', 'val')] = mask
        self.save([d])


class EllipticBitcoinTemporalDataset(InMemoryDataset):
    """Per-timestep elliptic subgraphs (reference
    ``elliptic_temporal.py`` — same raw csvs as elliptic, one graph per
    time step)."""

    def __init__(self, root: str, t: int, **kwargs):
        self.t = t
        super().__init__(root, **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['elliptic_txs_features.csv',
                'elliptic_txs_edgelist.csv',
                'elliptic_txs_classes.csv']

    @property
    def processed_file_names(self) -> Sequence[str]:
        return [f't{self.t}.npz']

    def process(self):
        feat = np.genfromtxt(
            osp.join(self.raw_dir, self.raw_file_names[0]),
            delimiter=',')
        keep = feat[:, 1].astype(int) == self.t
        ids = feat[keep, 0].astype(np.int64)
        remap = {int(v): i for i, v in enumerate(ids)}
        x = feat[keep, 2:].astype(np.float32)
        edges = np.genfromtxt(
            osp.join(self.raw_dir, self.raw_file_names[1]),
            delimiter=',', skip_header=1, dtype=np.int64)
        coo = np.asarray([[remap[int(a)], remap[int(b)]]
                          for a, b in edges
                          if int(a) in remap and int(b) in remap])
        coo = coo.T if coo.size else np.zeros((2, 0), np.int64)
        self.save([Data(x=x, edge_index=coo, num_nodes=len(ids))])


class GEDDataset(InMemoryDataset):
    """Graph-edit-distance pairs (reference ``ged_dataset.py`` — gexf
    graphs + ged matrix; here from an edge-list-per-graph layout)."""

    def __init__(self, root: str, name: str, train: bool = True,
                 **kwargs):
        self.name = name
        self.split = 'train' if train else 'test'
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.split}_graphs.json', 'ged.npy']

    @property
    def processed_file_names(self) -> Sequence[str]:
        return [f'{self.split}.npz']

    def process(self):
        with open(osp.join(self.raw_dir, self.raw_file_names[0])) as f:
            graphs = json.load(f)
        self.ged = np.load(osp.join(self.raw_dir, 'ged.npy'))
        out = []
        for g in graphs:
            coo = np.asarray(g['edges'], np.int64).T \
                if g['edges'] else np.zeros((2, 0), np.int64)
            n = int(g.get('n', coo.max() + 1 if coo.size else 1))
            out.append(Data(edge_index=coo, num_nodes=n,
                            x=np.ones((n, 1), np.float32),
                            i=np.asarray([g.get('i', len(out))])))
        self.save(out)


class BrcaTcga(InMemoryDataset):
    """Breast-cancer gene graph (reference ``brca_tgca.py`` — gene
    edge list + patient feature/label csv)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['edge_index.npy', 'graph_features.npy',
                'graph_labels.npy']

    def process(self):
        coo = np.load(osp.join(self.raw_dir, 'edge_index.npy'))
        feats = np.load(osp.join(self.raw_dir, 'graph_features.npy'))
        labels = np.load(osp.join(self.raw_dir, 'graph_labels.npy'))
        out = []
        for x, y in zip(feats, labels):
            out.append(Data(x=np.asarray(x, np.float32).reshape(-1, 1),
                            edge_index=coo.astype(np.int64),
                            y=np.asarray([y], np.float32)))
        self.save(out)


class DBP15K(_HeteroInMemory):
    """Cross-lingual KG alignment (reference ``dbp15k.py`` — triples
    per language + anchor links)."""

    def __init__(self, root: str, pair: str = 'zh_en', **kwargs):
        self.pair = pair
        super().__init__(osp.join(root, pair), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['triples_1', 'triples_2', 'ref_ent_ids']

    def process(self):
        def load_triples(fname):
            return np.genfromtxt(osp.join(self.raw_dir, fname),
                                 dtype=np.int64)
        t1 = load_triples('triples_1')
        t2 = load_triples('triples_2')
        anchors = load_triples('ref_ent_ids')
        d = HeteroData()
        for i, t in ((1, t1), (2, t2)):
            d[f'lang{i}'].num_nodes = int(t[:, [0, 2]].max()) + 1
            et = (f'lang{i}', 'rel', f'lang{i}')
            d[et].edge_index = t[:, [0, 2]].T
            d[et].edge_type = t[:, 1]
        d[('lang1', 'aligned', 'lang2')].edge_index = anchors.T[:2]
        self._data = d


class UPFD(InMemoryDataset):
    """Fake-news propagation trees (reference ``upfd.py`` — npz
    node features + graph structure arrays)."""

    def __init__(self, root: str, name: str, feature: str = 'profile',
                 **kwargs):
        self.name = name
        self.feature = feature
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['node_graph_id.npy', 'graph_labels.npy', 'A.txt',
                f'new_{self.feature}_feature.npz']

    def process(self):
        import scipy.sparse as sp
        gid = np.load(osp.join(self.raw_dir, 'node_graph_id.npy'))
        glab = np.load(osp.join(self.raw_dir, 'graph_labels.npy'))
        coo = np.genfromtxt(osp.join(self.raw_dir, 'A.txt'),
                            delimiter=',', dtype=np.int64).T
        x = sp.load_npz(osp.join(
            self.raw_dir, f'new_{self.feature}_feature.npz')).todense()
        x = np.asarray(x, np.float32)
        out = []
        for g in np.unique(gid):
            mask = gid == g
            idx = np.nonzero(mask)[0]
            remap = np.full(len(gid), -1)
            remap[idx] = np.arange(len(idx))
            em = mask[coo[0]] & mask[coo[1]]
            out.append(Data(x=x[mask], edge_index=remap[coo[:, em]],
                            y=np.asarray([glab[int(g)]]),
                            num_nodes=len(idx)))
        self.save(out)


class SuiteSparseMatrixCollection(InMemoryDataset):
    """Sparse-matrix graphs (reference ``suite_sparse.py`` — .mat)."""

    def __init__(self, root: str, group: str, name: str, **kwargs):
        self.group, self.name = group, name
        super().__init__(osp.join(root, group, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{self.name}.mat']

    def process(self):
        from scipy.io import loadmat
        m = loadmat(osp.join(self.raw_dir, self.raw_file_names[0]))
        A = m['Problem']['A'][0][0].tocoo()
        coo = np.stack([A.row, A.col]).astype(np.int64)
        self.save([Data(edge_index=coo, edge_attr=A.data
                        .astype(np.float32), num_nodes=A.shape[0])])


class PCQM4Mv2(InMemoryDataset):
    """OGB-LSC molecules (reference ``pcqm4m.py`` — smiles csv;
    rdkit-gated with SMILES-chain fallback like MoleculeNet)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['data.csv']

    def process(self):
        import csv
        from .molecules import MoleculeNet
        out = []
        with open(osp.join(self.raw_dir, 'data.csv')) as f:
            reader = csv.reader(f)
            next(reader)
            for row in reader:
                smiles, y = row[1], row[2]
                try:
                    from rdkit import Chem
                    from ..utils.misc import from_rdmol
                    d = from_rdmol(Chem.MolFromSmiles(smiles))
                except ImportError:
                    d = MoleculeNet._smiles_fallback(smiles)
                d.y = np.asarray([float(y) if y else np.nan],
                                 np.float32)
                out.append(d)
        self.save(out)


class CornellTemporalHyperGraphDataset(InMemoryDataset):
    """Temporal hypergraphs (reference ``cornell.py`` — simplex list
    files: sizes, members, times)."""

    def __init__(self, root: str, name: str, **kwargs):
        self.name = name
        super().__init__(osp.join(root, name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        k = self.name
        return [f'{k}-nverts.txt', f'{k}-simplices.txt',
                f'{k}-times.txt']

    def process(self):
        raw = self.raw_dir
        nverts = np.genfromtxt(
            osp.join(raw, self.raw_file_names[0]), dtype=np.int64)
        members = np.genfromtxt(
            osp.join(raw, self.raw_file_names[1]), dtype=np.int64)
        times = np.genfromtxt(
            osp.join(raw, self.raw_file_names[2]), dtype=np.int64)
        # hyperedge incidence [2, sum(nverts)]: (node, hyperedge id)
        he = np.repeat(np.arange(len(nverts)), nverts)
        inc = np.stack([members - members.min(), he])
        d = Data(edge_index=inc,
                 num_nodes=int(members.max() - members.min()) + 1)
        d.hyperedge_time = times
        d.num_hyperedges = np.asarray(len(nverts))
        self.save([d])


class _QADataset(InMemoryDataset):
    """Question-answering subgraphs (reference ``cwq.py`` /
    ``web_qsp_dataset.py`` — json with per-question triples)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['data.json']

    def process(self):
        with open(osp.join(self.raw_dir, 'data.json')) as f:
            items = json.load(f)
        out = []
        for item in items:
            ent = {}
            triples = []
            for h, r, t in item['graph']:
                hi = ent.setdefault(h, len(ent))
                ti = ent.setdefault(t, len(ent))
                triples.append((hi, ti))
            coo = np.asarray(triples, np.int64).T if triples \
                else np.zeros((2, 0), np.int64)
            d = Data(edge_index=coo, num_nodes=max(len(ent), 1))
            d.question = np.frombuffer(
                item['question'].encode()[:128].ljust(128),
                np.uint8).copy()
            out.append(d)
        self.save(out)


class CWQDataset(_QADataset):
    """(reference ``cwq.py``)."""


class WebQSPDataset(_QADataset):
    """(reference ``web_qsp_dataset.py``)."""


class _GatedDataset:
    """Factory for datasets whose raw formats need absent deps."""

    def __init__(self, name, dep):
        self.name, self.dep = name, dep

    def __call__(self, *a, **k):
        raise ImportError(f'{self.name} requires {self.dep} '
                          '(not available in this image)')


# permanently dep-gated (packages absent from this image); the former
# raw-dump stubs (OPF, RCDD, GraphLand, TAG, IGMC, ProteinMPNN) now have
# real parsers in datasets/industrial.py
AirfRANS = _GatedDataset('AirfRANS', 'pyvista')
NeuroGraphDataset = _GatedDataset('NeuroGraphDataset', 'boto3 download')
HydroNet = _GatedDataset('HydroNet', 'hydronet raw dumps')
OMDB = _GatedDataset('OMDB', 'ase')
OSE_GVCS = _GatedDataset('OSE_GVCS', 'kuzu')
GitMolDataset = _GatedDataset('GitMolDataset', 'rdkit')
InstructMolDataset = _GatedDataset('InstructMolDataset', 'rdkit')
MoleculeGPTDataset = _GatedDataset('MoleculeGPTDataset', 'rdkit')


class QM7b(InMemoryDataset):
    """QM7b molecules (reference ``qm7.py`` — .mat with Coulomb
    matrices + multi-target labels)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['qm7b.mat']

    def process(self):
        from scipy.io import loadmat
        m = loadmat(osp.join(self.raw_dir, 'qm7b.mat'))
        coulomb = m['X']          # [N_mol, 23, 23]
        targets = m['T'].astype(np.float32)
        out = []
        for i in range(coulomb.shape[0]):
            C = coulomb[i]
            mask = C.any(0)
            C = C[mask][:, mask]
            r, c = np.nonzero(np.triu(C, 1))
            coo = np.concatenate([np.stack([r, c]),
                                  np.stack([c, r])], 1)
            w = np.concatenate([C[r, c], C[c, r]]).astype(np.float32)
            out.append(Data(edge_index=coo.astype(np.int64),
                            edge_attr=w, y=targets[i:i + 1],
                            num_nodes=int(mask.sum()),
                            z=np.diag(C).astype(np.float32)))
        self.save(out)


PascalVOCKeypoints = _GatedDataset('PascalVOCKeypoints',
                                   'VOC xml annotations + images')
