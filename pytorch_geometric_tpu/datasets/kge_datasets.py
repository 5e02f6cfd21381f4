"""Knowledge-graph and temporal-event datasets.

Reference: ``torch_geometric/datasets/`` — freebase.py (FB15k_237),
word_net.py (WordNet18/WordNet18RR), wikidata.py (Wikidata5M),
rel_link_pred_dataset.py, entities.py, icews.py (ICEWS18),
gdelt.py / gdelt_lite.py, myket.py. All parse whitespace/tab triple
files ``head rel tail [time]``; entity/relation vocabularies are built
on first read. Zero-egress: raw files go in ``root/raw``.
"""

import os.path as osp
from typing import Dict, Sequence

import numpy as np

from ..data.data import Data
from ..data.dataset import InMemoryDataset


def _read_triples(path: str, ent: Dict[str, int], rel: Dict[str, int],
                  with_time: bool = False):
    heads, rels, tails, times = [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 3:
                continue
            h, r, t = parts[0], parts[1], parts[2]
            heads.append(ent.setdefault(h, len(ent)))
            rels.append(rel.setdefault(r, len(rel)))
            tails.append(ent.setdefault(t, len(ent)))
            if with_time and len(parts) > 3:
                times.append(int(parts[3]))
    out = (np.asarray(heads, np.int64), np.asarray(rels, np.int64),
           np.asarray(tails, np.int64))
    if with_time:
        return out + (np.asarray(times, np.int64),)
    return out


class _TripleDataset(InMemoryDataset):
    """Shared KGE layout: train.txt/valid.txt/test.txt triple files
    collated into ONE Data with edge_type + split masks (the
    reference's RelLinkPredDataset layout)."""

    splits = ('train', 'valid', 'test')

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{s}.txt' for s in self.splits]

    def process(self):
        ent: Dict[str, int] = {}
        rel: Dict[str, int] = {}
        per_split = {}
        for s in self.splits:
            per_split[s] = _read_triples(
                osp.join(self.raw_dir, f'{s}.txt'), ent, rel)
        h = np.concatenate([per_split[s][0] for s in self.splits])
        r = np.concatenate([per_split[s][1] for s in self.splits])
        t = np.concatenate([per_split[s][2] for s in self.splits])
        sizes = [len(per_split[s][0]) for s in self.splits]
        split_id = np.repeat(np.arange(3), sizes)
        d = Data(edge_index=np.stack([h, t]).astype(np.int64),
                 edge_type=r, num_nodes=len(ent))
        d.train_mask = split_id == 0
        d.val_mask = split_id == 1
        d.test_mask = split_id == 2
        d.num_relations = np.asarray(len(rel))
        self.save([d])


class FB15k_237(_TripleDataset):
    """(reference ``freebase.py:FB15k_237``)."""


class WordNet18(_TripleDataset):
    """(reference ``word_net.py:WordNet18``)."""


class WordNet18RR(_TripleDataset):
    """(reference ``word_net.py:WordNet18RR``)."""


class Wikidata5M(_TripleDataset):
    """(reference ``wikidata.py:Wikidata5M``)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['wikidata5m_transductive_train.txt',
                'wikidata5m_transductive_valid.txt',
                'wikidata5m_transductive_test.txt']

    def process(self):
        ent: Dict[str, int] = {}
        rel: Dict[str, int] = {}
        per = [
            _read_triples(osp.join(self.raw_dir, f), ent, rel)
            for f in self.raw_file_names]
        h = np.concatenate([p[0] for p in per])
        r = np.concatenate([p[1] for p in per])
        t = np.concatenate([p[2] for p in per])
        split_id = np.repeat(np.arange(3), [len(p[0]) for p in per])
        d = Data(edge_index=np.stack([h, t]), edge_type=r,
                 num_nodes=len(ent))
        d.train_mask = split_id == 0
        d.val_mask = split_id == 1
        d.test_mask = split_id == 2
        d.num_relations = np.asarray(len(rel))
        self.save([d])


class RelLinkPredDataset(_TripleDataset):
    """FB15k-237 for R-GCN link prediction
    (reference ``rel_link_pred_dataset.py``)."""


class Entities(InMemoryDataset):
    """AIFB/MUTAG/BGS/AM RDF entity-classification graphs (reference
    ``entities.py`` — here from pre-extracted triple + label tsv)."""

    def __init__(self, root: str, name: str, **kwargs):
        self.name = name.lower()
        super().__init__(osp.join(root, self.name), **kwargs)

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['triples.txt', 'train_labels.txt', 'test_labels.txt']

    def process(self):
        ent: Dict[str, int] = {}
        rel: Dict[str, int] = {}
        h, r, t = _read_triples(osp.join(self.raw_dir, 'triples.txt'),
                                ent, rel)

        def read_labels(fname):
            idx, lab = [], []
            with open(osp.join(self.raw_dir, fname)) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) >= 2 and parts[0] in ent:
                        idx.append(ent[parts[0]])
                        lab.append(int(parts[1]))
            return np.asarray(idx, np.int64), np.asarray(lab, np.int64)

        tr_i, tr_y = read_labels('train_labels.txt')
        te_i, te_y = read_labels('test_labels.txt')
        n = len(ent)
        y = np.full(n, -1, np.int64)
        y[tr_i] = tr_y
        y[te_i] = te_y
        d = Data(edge_index=np.stack([h, t]), edge_type=r, y=y,
                 num_nodes=n)
        d.train_idx, d.test_idx = tr_i, te_i
        d.num_relations = np.asarray(len(rel))
        self.save([d])


class _TemporalEvents(InMemoryDataset):
    """Shared temporal-KG layout (reference ``icews.py:EventDataset``):
    tab-separated ``sub rel obj time`` per split."""

    splits = ('train', 'valid', 'test')

    @property
    def raw_file_names(self) -> Sequence[str]:
        return [f'{s}.txt' for s in self.splits]

    def process(self):
        ent: Dict[str, int] = {}
        rel: Dict[str, int] = {}
        out = []
        for s in self.splits:
            h, r, t, tm = _read_triples(
                osp.join(self.raw_dir, f'{s}.txt'), ent, rel,
                with_time=True)
            d = Data(edge_index=np.stack([h, t]), edge_type=r,
                     num_nodes=max(len(ent), 1))
            d.t = tm
            d.split = s
            out.append(d)
        for d in out:   # vocab known only after all splits parsed
            d.num_nodes = len(ent)
            d.num_relations = np.asarray(len(rel))
        self.save(out)


class ICEWS18(_TemporalEvents):
    """(reference ``icews.py:ICEWS18``)."""


class GDELT(_TemporalEvents):
    """(reference ``gdelt.py``)."""


class GDELTLite(_TemporalEvents):
    """(reference ``gdelt_lite.py``)."""

    splits = ('train',)


class MyketDataset(InMemoryDataset):
    """App-install temporal interactions (reference ``myket.py`` —
    csv ``user,item,timestamp`` + item features npy)."""

    @property
    def raw_file_names(self) -> Sequence[str]:
        return ['myket.csv', 'app_info_sample.npy']

    def process(self):
        rows = np.genfromtxt(osp.join(self.raw_dir, 'myket.csv'),
                             delimiter=',', skip_header=1)
        src = rows[:, 0].astype(np.int64)
        dst = rows[:, 1].astype(np.int64)
        t = rows[:, 2].astype(np.int64)
        msg = np.load(osp.join(self.raw_dir, 'app_info_sample.npy'))
        d = Data(edge_index=np.stack([src, dst]),
                 num_nodes=int(max(src.max(), dst.max())) + 1)
        d.t = t
        d.msg = msg[dst % len(msg)].astype(np.float32)
        self.save([d])
