"""Long-tail dataset parsers, driven end-to-end with synthetic raw
files in the reference formats (reference ``test/datasets/``)."""

import json
import os
import os.path as osp
import pickle
import tempfile

import numpy as np
import pytest
import scipy.sparse as sp

rng = np.random.default_rng(0)


def _root(*sub):
    root = tempfile.mkdtemp()
    raw = osp.join(root, *sub, 'raw')
    os.makedirs(raw)
    return root, raw


def test_citation_full_npz():
    from pytorch_geometric_tpu.datasets import CitationFull
    root, raw = _root('cora')
    n = 20
    adj = sp.random(n, n, 0.2, format='csr', random_state=0)
    attr = sp.random(n, 8, 0.5, format='csr', random_state=1)
    np.savez(osp.join(raw, 'cora.npz'), adj_data=adj.data,
             adj_indices=adj.indices, adj_indptr=adj.indptr,
             adj_shape=adj.shape, attr_data=attr.data,
             attr_indices=attr.indices, attr_indptr=attr.indptr,
             attr_shape=attr.shape, labels=rng.integers(0, 3, n))
    d = CitationFull(root, 'cora')[0]
    assert d.x.shape == (20, 8) and d.num_edges > 0


def test_saint_layout():
    from pytorch_geometric_tpu.datasets import Flickr, Yelp
    for cls, multilabel in ((Flickr, False), (Yelp, True)):
        root, raw = _root()
        n = 12
        adj = sp.random(n, n, 0.3, format='csr', random_state=0)
        np.savez(osp.join(raw, 'adj_full.npz'), data=adj.data,
                 indices=adj.indices, indptr=adj.indptr,
                 shape=adj.shape)
        np.save(osp.join(raw, 'feats.npy'), rng.normal(size=(n, 5)))
        cmap = {str(i): ([1, 0, 1] if multilabel else
                         int(rng.integers(0, 3))) for i in range(n)}
        with open(osp.join(raw, 'class_map.json'), 'w') as f:
            json.dump(cmap, f)
        with open(osp.join(raw, 'role.json'), 'w') as f:
            json.dump({'tr': list(range(8)), 'va': [8, 9],
                       'te': [10, 11]}, f)
        d = cls(root)[0]
        assert d.x.shape == (12, 5)
        assert int(d.train_mask.sum()) == 8
        assert (d.y.ndim == 2) == multilabel


def test_triples():
    from pytorch_geometric_tpu.datasets import FB15k_237
    root, raw = _root()
    for s, cnt in [('train', 40), ('valid', 10), ('test', 10)]:
        with open(osp.join(raw, f'{s}.txt'), 'w') as f:
            for _ in range(cnt):
                f.write(f'/e{rng.integers(0, 20)}\t/r{rng.integers(0, 5)}'
                        f'\t/e{rng.integers(0, 20)}\n')
    d = FB15k_237(root)[0]
    assert int(d.train_mask.sum()) == 40
    assert int(d.test_mask.sum()) == 10
    assert d.edge_type.shape[0] == 60


def test_zinc_pickle():
    from pytorch_geometric_tpu.datasets import ZINC
    root, raw = _root()
    mols = [{'atom_type': rng.integers(0, 10, 6),
             'bond_type': np.triu(rng.integers(0, 3, (6, 6)), 1),
             'logP_SA_cycle_normalized': rng.normal()}
            for _ in range(5)]
    with open(osp.join(raw, 'train.pickle'), 'wb') as f:
        pickle.dump(mols, f)
    ds = ZINC(root)
    assert len(ds) == 5
    assert ds[0].x.shape[1] == 1


def test_molecule_net_fallback():
    from pytorch_geometric_tpu.datasets import MoleculeNet
    root, raw = _root('esol')
    with open(osp.join(raw, 'delaney-processed.csv'), 'w') as f:
        f.write('Compound,ESOL,smiles\nA,1.2,CCO\nB,-0.5,c1ccccc1\n')
    ds = MoleculeNet(root, 'esol')
    assert len(ds) == 2
    assert ds[0].num_edges == 4   # chain CCO -> 2 undirected bonds


def test_imdb_hetero():
    from pytorch_geometric_tpu.datasets import IMDB
    root, raw = _root()
    sizes = [8, 4, 6]
    total = sum(sizes)
    sp.save_npz(osp.join(raw, 'adjM.npz'),
                sp.random(total, total, 0.3, format='csr',
                          random_state=0))
    for i, s in enumerate(sizes):
        sp.save_npz(osp.join(raw, f'features_{i}.npz'),
                    sp.random(s, 5, 0.5, format='csr', random_state=i))
    np.save(osp.join(raw, 'labels.npy'), rng.integers(0, 3, sizes[0]))
    np.savez(osp.join(raw, 'train_val_test_idx.npz'),
             train_idx=np.arange(4), val_idx=np.array([4, 5]),
             test_idx=np.array([6, 7]))
    d = IMDB(root)[0]
    assert d.node_types == ['movie', 'director', 'actor']
    assert int(d['movie'].train_mask.sum()) == 4


def test_movielens_100k():
    from pytorch_geometric_tpu.datasets import MovieLens100K
    root, raw = _root()
    np.savetxt(osp.join(raw, 'u.data'),
               np.stack([rng.integers(1, 6, 30),
                         rng.integers(1, 9, 30),
                         rng.integers(1, 6, 30),
                         rng.integers(0, 1000, 30)]).T, fmt='%d')
    with open(osp.join(raw, 'u.user'), 'w') as f:
        f.write('\n'.join(f'{i}|25|M|t|1' for i in range(1, 6)))
    with open(osp.join(raw, 'u.item'), 'w') as f:
        f.write('\n'.join(f'{i}|m{i}|d||u' for i in range(1, 9)))
    d = MovieLens100K(root)[0]
    et = ('user', 'rates', 'movie')
    assert d[et].edge_index.shape == (2, 30)
    assert d[et].edge_label.shape == (30,)


def test_synthetic_generators():
    from pytorch_geometric_tpu.datasets import (BA2MotifDataset,
                                                BAShapes,
                                                InfectionDataset,
                                                MixHopSyntheticDataset)
    d = BAShapes(num_base_nodes=40, num_motifs=4)[0]
    assert int(d.y.max()) == 3 and d.num_nodes == 60
    ds = BA2MotifDataset(num_graphs=6)
    assert len(ds) == 6 and int(ds[1].y[0]) == 1
    d = InfectionDataset(num_nodes=50)[0]
    assert d.y.shape == (50,)
    d = MixHopSyntheticDataset(homophily=0.9, num_nodes=100)[0]
    # high homophily -> most edges intra-class
    coo = np.asarray(d.edge_index)
    y = np.asarray(d.y)
    assert (y[coo[0]] == y[coo[1]]).mean() > 0.6


def test_missing_raw_raises():
    from pytorch_geometric_tpu.datasets import WikiCS
    with pytest.raises(RuntimeError, match='raw'):
        WikiCS(tempfile.mkdtemp())


def test_mesh_folder_and_shapenet():
    from pytorch_geometric_tpu.datasets import GeometricShapes, ShapeNet
    root, _ = _root()
    raw = osp.join(root, 'raw', 'cube')
    os.makedirs(raw)
    with open(osp.join(raw, 'a.off'), 'w') as f:
        f.write('OFF\n4 2 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n'
                '3 0 1 2\n3 0 2 3\n')
    ds = GeometricShapes(root)
    d = ds[0]
    assert d.pos.shape == (4, 3) and d.face.shape == (3, 2)
    assert int(d.y[0]) == 0

    root2, _ = _root()
    raw2 = osp.join(root2, 'raw', 'chair')
    os.makedirs(raw2)
    np.savetxt(osp.join(raw2, 'p1.txt'), np.concatenate(
        [rng.normal(size=(30, 6)), rng.integers(0, 4, (30, 1))], 1))
    ds = ShapeNet(root2)
    assert ds[0].pos.shape == (30, 3) and ds[0].y.shape == (30,)


def test_amazon_book_and_qa():
    from pytorch_geometric_tpu.datasets import AmazonBook, WebQSPDataset
    root, raw = _root()
    with open(osp.join(raw, 'train.txt'), 'w') as f:
        f.write('0 1 2 3\n1 0 4\n')
    with open(osp.join(raw, 'test.txt'), 'w') as f:
        f.write('0 4\n')
    d = AmazonBook(root)[0]
    et = ('user', 'rates', 'book')
    assert d[et].edge_index.shape == (2, 5)
    assert d[et].edge_label_index.shape == (2, 1)

    root2, raw2 = _root()
    with open(osp.join(raw2, 'data.json'), 'w') as f:
        json.dump([{'question': 'who?', 'graph': [['a', 'r', 'b'],
                                                  ['b', 'r', 'c']]}], f)
    ds = WebQSPDataset(root2)
    assert ds[0].num_nodes == 3 and ds[0].num_edges == 2


def test_qm7b_coulomb():
    from scipy.io import savemat
    from pytorch_geometric_tpu.datasets import QM7b
    root, raw = _root()
    X = np.zeros((2, 23, 23))
    for i in range(2):
        n = 4 + i
        C = np.abs(rng.normal(size=(n, n)))
        X[i, :n, :n] = (C + C.T) / 2
    savemat(osp.join(raw, 'qm7b.mat'),
            {'X': X, 'T': rng.normal(size=(2, 14))})
    ds = QM7b(root)
    assert len(ds) == 2
    assert ds[0].num_nodes == 4 and ds[0].y.shape == (1, 14)


def test_gated_datasets_raise():
    from pytorch_geometric_tpu.datasets import (AirfRANS, OMDB,
                                                GitMolDataset)
    for cls in (AirfRANS, OMDB, GitMolDataset):
        with pytest.raises(ImportError):
            cls('/tmp/x')
