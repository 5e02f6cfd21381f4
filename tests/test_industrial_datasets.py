"""Synthesized-raw oracles for the six former dataset stubs
(VERDICT r4 #6): OPF, RCDD, GraphLand, IGMC, TAG, ProteinMPNN —
tiny raw dumps in the reference's layout, parsed and checked against
independently-computed expectations."""
import json
import os
import os.path as osp

import numpy as np
import pytest

from pytorch_geometric_tpu.datasets import (GraphLandDataset,
                                            IGMCDataset, OPFDataset,
                                            ProteinMPNNDataset, RCDD,
                                            TAGDataset)

rng = np.random.default_rng(3)


# ----------------------------------------------------------------- OPF
def _opf_scenario(i):
    def nodes(n, f):
        return rng.standard_normal((n, f)).round(3).tolist()

    return {
        'grid': {
            'context': [[0.5], [float(i)]],
            'nodes': {'bus': nodes(4, 3), 'generator': nodes(2, 4),
                      'load': nodes(2, 2), 'shunt': nodes(1, 2)},
            'edges': {
                'ac_line': {'senders': [0, 1], 'receivers': [1, 2],
                            'features': nodes(2, 5)},
                'transformer': {'senders': [2], 'receivers': [3],
                                'features': nodes(1, 6)},
                'generator_link': {'senders': [0, 1],
                                   'receivers': [0, 3],
                                   'features': []},
                'load_link': {'senders': [0, 1], 'receivers': [1, 2],
                              'features': []},
                'shunt_link': {'senders': [0], 'receivers': [2],
                               'features': []},
            },
        },
        'solution': {
            'nodes': {'bus': nodes(4, 2), 'generator': nodes(2, 3)},
            'edges': {'ac_line': {'features': nodes(2, 2)},
                      'transformer': {'features': nodes(1, 2)}},
        },
        'metadata': {'objective': 12.5 + i},
    }


def test_opf_dataset(tmp_path):
    raw = tmp_path / 'raw'
    case = 'pglib_opf_case14_ieee'
    for g in range(2):
        (raw / f'group_{g}').mkdir(parents=True)
    for i in range(20):
        g = i % 2
        with open(raw / f'group_{g}' / f'{case}_{i}.json', 'w') as f:
            json.dump(_opf_scenario(i), f)
    # samples_per_group=10, 2 groups: train < 18, val [18, 19), test >= 19
    kw = dict(case_name=case, num_groups=2, samples_per_group=10)
    train = OPFDataset(str(tmp_path), split='train', **kw)
    val = OPFDataset(str(tmp_path), split='val', **kw)
    test = OPFDataset(str(tmp_path), split='test', **kw)
    assert (len(train), len(val), len(test)) == (18, 1, 1)
    d = train[0]
    assert d['bus'].x.shape == (4, 3)
    assert d['generator'].y.shape == (2, 3)
    st = d[('bus', 'ac_line', 'bus')]
    np.testing.assert_array_equal(np.asarray(st.edge_index),
                                  [[0, 1], [1, 2]])
    assert np.asarray(st.edge_attr).shape == (2, 5)
    assert np.asarray(st.edge_label).shape == (2, 2)
    # reversed typed links
    np.testing.assert_array_equal(
        np.asarray(d[('bus', 'generator_link', 'generator')]
                   .edge_index),
        np.asarray(d[('generator', 'generator_link', 'bus')]
                   .edge_index)[::-1])
    assert float(d.objective) == 12.5 + 0


# ---------------------------------------------------------------- RCDD
def test_rcdd(tmp_path):
    raw = tmp_path / 'raw'
    raw.mkdir()
    # 3 items (global 0,2,4), 2 users (1,3), 1 shop (5)
    lines = []
    feats = {}
    for gid, nt in [(0, 'item'), (2, 'item'), (4, 'item'),
                    (1, 'user'), (3, 'user'), (5, 'shop')]:
        f = rng.standard_normal(3).round(3)
        feats[gid] = f
        lines.append(f'{gid},{nt},{":".join(map(str, f))}')
    (raw / 'AliRCD_ICDM_nodes.csv').write_text('\n'.join(lines))
    (raw / 'AliRCD_ICDM_edges.csv').write_text(
        '1,0,user,item,clicks\n3,2,user,item,clicks\n'
        '5,4,shop,item,sells\n')
    (raw / 'AliRCD_ICDM_train_labels.csv').write_text('0,1\n2,0\n')
    (raw / 'AliRCD_ICDM_test_labels.csv').write_text('4\t1\n')
    ds = RCDD(str(tmp_path))
    d = ds[0]
    assert d['item'].num_nodes == 3 and d['user'].num_nodes == 2
    np.testing.assert_allclose(np.asarray(d['item'].x)[0], feats[0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d['user'].x)[1], feats[3],
                               atol=1e-6)
    ei = np.asarray(d[('user', 'clicks', 'item')].edge_index)
    np.testing.assert_array_equal(ei, [[0, 1], [0, 1]])
    np.testing.assert_array_equal(np.asarray(d['item'].y), [1, 0, 1])
    np.testing.assert_array_equal(np.asarray(d['item'].train_mask),
                                  [True, True, False])
    np.testing.assert_array_equal(np.asarray(d['item'].test_mask),
                                  [False, False, True])
    assert ds.num_classes == 2


# ----------------------------------------------------------- GraphLand
def _graphland_raw(root, name, n=30):
    d = osp.join(root, name, 'raw', name)
    os.makedirs(d)
    info = {
        'task': 'regression', 'target_name': 'tgt',
        'numerical_features_names': ['a', 'b'],
        'fraction_features_names': ['b'],
        'categorical_features_names': ['c'],
    }
    import yaml
    with open(osp.join(d, 'info.yaml'), 'w') as f:
        yaml.safe_dump(info, f)
    a = rng.standard_normal(n)
    a[3] = np.nan                            # imputation path
    b = rng.uniform(0, 1, n)
    c = rng.integers(0, 3, n)
    with open(osp.join(d, 'features.csv'), 'w') as f:
        f.write('idx,a,b,c\n')
        for i in range(n):
            f.write(f'{i},{a[i]},{b[i]},{c[i]}\n')
    tgt = rng.standard_normal(n)
    tgt[5] = np.nan                          # unlabeled node
    with open(osp.join(d, 'targets.csv'), 'w') as f:
        f.write('idx,tgt\n')
        for i in range(n):
            f.write(f'{i},{tgt[i]}\n')
    masks = np.zeros((n, 3), bool)
    masks[: n // 3, 0] = True
    masks[n // 3: n // 2, 1] = True
    masks[n // 2:, 2] = True
    for split in ('RL', 'TH'):
        with open(osp.join(d, f'split_masks_{split}.csv'), 'w') as f:
            f.write('idx,train,val,test\n')
            for i in range(n):
                f.write(f'{i},{masks[i, 0]},{masks[i, 1]},'
                        f'{masks[i, 2]}\n')
    edges = rng.integers(0, n, (40, 2))
    with open(osp.join(d, 'edgelist.csv'), 'w') as f:
        f.write('source,target\n')
        for s, t in edges:
            f.write(f'{s},{t}\n')
    return masks, tgt


def test_graphland_transductive(tmp_path):
    name = 'hm-prices'
    masks, tgt = _graphland_raw(str(tmp_path), name)
    ds = GraphLandDataset(str(tmp_path), name=name, split='RL')
    assert len(ds) == 1
    d = ds[0]
    n = 30
    assert int(d.num_nodes) == n
    # one-hot(3 cats) + num + frac
    x = np.asarray(d.x)
    assert x.shape == (n, 1 + 1 + 3)
    assert np.isfinite(x).all()              # NaN imputed
    # regression targets standard-scaled on train rows
    labeled = ~np.isnan(tgt)
    train = masks[:, 0] & labeled
    y = np.asarray(d.y)
    assert abs(float(y[train].mean())) < 0.2
    # unlabeled node 5 excluded from every mask
    assert not np.asarray(d.train_mask)[5]
    np.testing.assert_array_equal(np.asarray(d.val_mask),
                                  masks[:, 1] & labeled)
    # undirected: every edge has its reverse
    ei = np.asarray(d.edge_index)
    s = set(map(tuple, ei.T.tolist()))
    assert all((b, a) in s for a, b in s)
    # feature-family masks partition the columns
    fam = (np.asarray(d.x_numerical_mask).astype(int)
           + np.asarray(d.x_fraction_mask).astype(int)
           + np.asarray(d.x_categorical_mask).astype(int))
    np.testing.assert_array_equal(fam, np.ones(x.shape[1], int))


def test_graphland_inductive(tmp_path):
    name = 'hm-prices'
    masks, tgt = _graphland_raw(str(tmp_path), name)
    ds = GraphLandDataset(str(tmp_path), name=name, split='THI')
    assert len(ds) == 3                      # train/val/test snapshots
    sizes = [int(d.num_nodes) for d in ds]
    assert sizes[0] < sizes[1] < sizes[2] == 30   # growing snapshots
    d_val = ds[1]
    # val snapshot = train+val nodes; label mask only on val nodes
    node_id = np.asarray(d_val.cross_snapshot_node_id)
    np.testing.assert_array_equal(
        node_id, np.nonzero(masks[:, 0] | masks[:, 1])[0])
    lm = np.asarray(d_val.mask)
    labeled = ~np.isnan(tgt)
    np.testing.assert_array_equal(
        node_id[lm], np.nonzero(masks[:, 1] & labeled)[0])


# ---------------------------------------------------------------- IGMC
def test_igmc(tmp_path):
    import h5py
    nu, ni = 5, 4
    M = rng.integers(1, 6, (nu, ni)).astype(np.float32)
    Otrain = (rng.uniform(size=(nu, ni)) < 0.5)
    Otest = ~Otrain & (rng.uniform(size=(nu, ni)) < 0.5)
    Wu = rng.standard_normal((nu, 3)).astype(np.float32)
    Wm = rng.standard_normal((ni, 2)).astype(np.float32)
    raw = tmp_path / 'flixster' / 'raw'
    raw.mkdir(parents=True)
    # matlab v7.3 is column-major: h5py datasets hold the TRANSPOSE
    with h5py.File(raw / 'training_test_dataset.mat', 'w') as f:
        for k, v in [('M', M), ('Otraining', Otrain.astype(np.float64)),
                     ('Otest', Otest.astype(np.float64)),
                     ('W_users', Wu), ('W_movies', Wm)]:
            f[k] = np.asarray(v).T
    ds = IGMCDataset(str(tmp_path), name='Flixster')
    d = ds[0]
    np.testing.assert_allclose(np.asarray(d['user'].x), Wu, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d['item'].x), Wm, atol=1e-6)
    st = d[('user', 'rates', 'item')]
    ei = np.asarray(st.edge_index)
    r, c = np.nonzero(Otrain)
    np.testing.assert_array_equal(ei, np.stack([r, c]))
    np.testing.assert_allclose(np.asarray(st.rating), M[r, c])
    np.testing.assert_array_equal(
        np.asarray(d[('item', 'rated_by', 'user')].edge_index),
        ei[::-1])
    eli = np.asarray(st.edge_label_index)
    r2, c2 = np.nonzero(Otest)
    np.testing.assert_array_equal(eli, np.stack([r2, c2]))
    np.testing.assert_allclose(np.asarray(st.edge_label), M[r2, c2])


# ----------------------------------------------------------------- TAG
class _ToyTokenizer:
    pad_token_id = 0

    def __call__(self, texts, padding=None, truncation=None,
                 max_length=512, **kw):
        ids = [[1 + (hash(w) % 50) for w in t.split()][:8]
               for t in texts]
        ids = [x + [0] * (8 - len(x)) for x in ids]
        att = [[1 if i else 0 for i in x] for x in ids]
        return {'input_ids': ids, 'attention_mask': att}


class _TinyDataset:
    name = 'tiny-tag'

    def __init__(self, data):
        self._d = data

    def __getitem__(self, i):
        return self._d

    def __len__(self):
        return 1


def test_tag_dataset(tmp_path):
    from pytorch_geometric_tpu.data import Data
    n = 10
    y = rng.integers(0, 3, n)
    tm = np.zeros(n, bool)
    tm[:4] = True
    vm = np.zeros(n, bool)
    vm[4:6] = True
    sm = ~tm & ~vm
    data = Data(x=np.eye(n, dtype=np.float32),
                edge_index=np.stack([np.arange(n - 1),
                                     np.arange(1, n)]),
                y=y, train_mask=tm, val_mask=vm, test_mask=sm,
                num_nodes=n)
    text = [f'node number {i} text' for i in range(n)]
    preds = rng.integers(0, 3, (n, 5))
    tag = TAGDataset(str(tmp_path / 'tag'), _TinyDataset(data),
                     text=text, tokenizer=_ToyTokenizer(),
                     llm_predictions=preds, token_on_disk=True)
    assert tag.num_classes == 3
    np.testing.assert_array_equal(tag.is_gold, tm)
    np.testing.assert_array_equal(tag.get_idx_split()['val'],
                                  np.nonzero(vm)[0])
    tok = tag.tokenize_graph()
    assert tok['input_ids'].shape == (n, 8)
    # disk cache round-trip
    tok2 = tag.tokenize_graph()
    np.testing.assert_array_equal(tok['input_ids'], tok2['input_ids'])
    # pseudo labels: gold rows keep y, others take LLM top-1
    pl = tag.pseudo_labels()
    np.testing.assert_array_equal(pl[tm], y[tm])
    np.testing.assert_array_equal(pl[~tm], preds[~tm, 0])
    td = tag.to_text_dataset()
    item = td[2]
    assert item['labels'] == y[2] and item['is_gold'] == tm[2]
    assert len(td) == n


# --------------------------------------------------------- ProteinMPNN
def test_protein_mpnn(tmp_path):
    torch = pytest.importorskip('torch')
    raw = tmp_path / 'raw'
    (raw / 'pdb' / 'ab').mkdir(parents=True)
    seq = 'ACDEFGHIKL'
    xyz = rng.standard_normal((len(seq), 14, 3)).astype(np.float32)
    xyz[4] = np.nan                          # unresolved residue
    torch.save({'seq': seq, 'xyz': xyz}, raw / 'pdb/ab/1abc_A.pt')
    seq2 = 'MNPQ'
    xyz2 = rng.standard_normal((len(seq2), 14, 3)).astype(np.float32)
    torch.save({'seq': seq2, 'xyz': xyz2}, raw / 'pdb/ab/2abx_B.pt')
    (raw / 'list.csv').write_text(
        'CHAINID,DEPOSITION,RESOLUTION,HASH,CLUSTER,SEQUENCE\n'
        f'1abc_A,2020-01-01,2.0,h1,10,{seq}\n'
        f'2abx_B,2020-01-01,1.5,h2,20,{seq2}\n'
        f'3bad_C,2020-01-01,9.9,h3,30,{seq2}\n')  # fails rescut
    (raw / 'valid_clusters.txt').write_text('20\n')
    (raw / 'test_clusters.txt').write_text('999\n')

    train = ProteinMPNNDataset(str(tmp_path), split='train')
    valid = ProteinMPNNDataset(str(tmp_path), split='valid')
    test = ProteinMPNNDataset(str(tmp_path), split='test')
    assert (len(train), len(valid), len(test)) == (1, 1, 0)
    d = train[0]
    L = len(seq)
    assert np.asarray(d.x).shape == (L, 4, 3)
    np.testing.assert_allclose(np.asarray(d.x)[0], xyz[0, :4], atol=1e-6)
    alphabet = 'ACDEFGHIKLMNPQRSTVWYX'
    np.testing.assert_array_equal(
        np.asarray(d.chain_seq_label),
        [alphabet.index(a) for a in seq])
    mask = np.asarray(d.mask)
    assert mask[4] == 0.0 and mask.sum() == L - 1
    assert np.isfinite(np.asarray(d.x)).all()   # NaNs zeroed
    np.testing.assert_array_equal(np.asarray(d.residue_idx),
                                  np.arange(L))
    np.testing.assert_array_equal(np.asarray(d.chain_encoding_all),
                                  np.ones(L))
