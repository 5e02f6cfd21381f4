"""Dataset-parser parity wave 2 vs the reference oracle: KarateClub
(fully embedded; exact Data equality) and WebKB (synthesized raw
files through both parsers)."""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')


def test_karate_club_oracle():
    from torch_geometric.datasets import KarateClub as Ref
    from pytorch_geometric_tpu.datasets import KarateClub
    r = Ref()[0]
    o = KarateClub()[0]
    np.testing.assert_array_equal(np.asarray(o.edge_index),
                                  r.edge_index.numpy())
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy())
    np.testing.assert_array_equal(np.asarray(o.y), r.y.numpy())
    np.testing.assert_array_equal(np.asarray(o.train_mask),
                                  r.train_mask.numpy())


def _write_webkb_raw(raw_dir, rng):
    import os
    os.makedirs(raw_dir, exist_ok=True)
    n, f, e = 12, 6, 30
    feats = rng.integers(0, 2, (n, f))
    ys = rng.integers(0, 5, n)
    lines = ['node_id\tfeature\tlabel']
    for i in range(n):
        lines.append(f"{i}\t{','.join(map(str, feats[i]))}\t{ys[i]}")
    with open(osp.join(raw_dir, 'out1_node_feature_label.txt'),
              'w') as fh:
        fh.write('\n'.join(lines) + '\n')
    edges = ['src\tdst']
    for _ in range(e):
        edges.append(f"{rng.integers(0, n)}\t{rng.integers(0, n)}")
    with open(osp.join(raw_dir, 'out1_graph_edges.txt'), 'w') as fh:
        fh.write('\n'.join(edges) + '\n')
    for i in range(10):
        tr = rng.random(n) < 0.6
        va = ~tr & (rng.random(n) < 0.5)
        te = ~tr & ~va
        np.savez(osp.join(raw_dir, f'cornell_split_0.6_0.2_{i}.npz'),
                 train_mask=tr, val_mask=va, test_mask=te)


def test_webkb_oracle(tmp_path):
    from torch_geometric.datasets import WebKB as Ref
    from pytorch_geometric_tpu.datasets import WebKB
    rng = np.random.default_rng(7)
    _write_webkb_raw(str(tmp_path / 'ref' / 'cornell' / 'raw'), rng)
    rng = np.random.default_rng(7)
    _write_webkb_raw(str(tmp_path / 'ours' / 'cornell' / 'raw'), rng)

    class NoDownload(Ref):
        def download(self):
            pass

    r = NoDownload(str(tmp_path / 'ref'), 'cornell')[0]
    o = WebKB(str(tmp_path / 'ours'), 'cornell')[0]
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy())
    np.testing.assert_array_equal(np.asarray(o.y), r.y.numpy())
    np.testing.assert_array_equal(np.asarray(o.edge_index),
                                  r.edge_index.numpy())
    for k in ('train_mask', 'val_mask', 'test_mask'):
        np.testing.assert_array_equal(np.asarray(o[k]),
                                      r[k].numpy(), err_msg=k)


def _social_npz(raw_dir, fname, rng, n=10, f=4, e=26):
    import os
    os.makedirs(raw_dir, exist_ok=True)
    np.savez(osp.join(raw_dir, fname),
             features=rng.random((n, f)).astype(np.float32),
             target=rng.integers(0, 3, n),
             edges=np.stack([rng.integers(0, n, e),
                             rng.integers(0, n, e)], 1))


@pytest.mark.parametrize('cls_name,fname', [
    ('FacebookPagePage', 'facebook.npz'),
    ('DeezerEurope', 'deezer_europe.npz'),
    ('LastFMAsia', 'lastfm_asia.npz'),
    ('GitHub', 'github.npz'),
])
def test_social_npz_oracle(tmp_path, cls_name, fname):
    import torch_geometric.datasets as RD
    import pytorch_geometric_tpu.datasets as OD
    _social_npz(str(tmp_path / 'ref' / 'raw'), fname,
                np.random.default_rng(3))
    _social_npz(str(tmp_path / 'ours' / 'raw'), fname,
                np.random.default_rng(3))

    ref_cls = getattr(RD, cls_name)

    class NoDownload(ref_cls):
        def download(self):
            pass

    r = NoDownload(str(tmp_path / 'ref'))[0]
    o = getattr(OD, cls_name)(str(tmp_path / 'ours'))[0]
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy())
    np.testing.assert_array_equal(np.asarray(o.y), r.y.numpy())
    np.testing.assert_array_equal(np.asarray(o.edge_index),
                                  r.edge_index.numpy())


def test_airports_oracle(tmp_path):
    import torch_geometric.datasets as RD
    import pytorch_geometric_tpu.datasets as OD
    import os
    rng = np.random.default_rng(5)
    n, e = 8, 20
    ids = rng.permutation(100)[:n]          # non-contiguous airport ids
    for root in ('ref', 'ours'):
        raw = str(tmp_path / root / 'usa' / 'raw')
        os.makedirs(raw, exist_ok=True)
        with open(osp.join(raw, 'labels-usa-airports.txt'), 'w') as fh:
            fh.write('node label\n')
            for i, v in enumerate(ids):
                fh.write(f'{v} {i % 4}\n')
        with open(osp.join(raw, 'usa-airports.edgelist'), 'w') as fh:
            for _ in range(e):
                a, b = rng.choice(ids, 2)
                fh.write(f'{a} {b}\n')
        rng = np.random.default_rng(5)
        ids = rng.permutation(100)[:n]

    class NoDownload(RD.Airports):
        def download(self):
            pass

    r = NoDownload(str(tmp_path / 'ref'), 'usa')[0]
    o = OD.Airports(str(tmp_path / 'ours'), 'usa')[0]
    np.testing.assert_array_equal(np.asarray(o.y), r.y.numpy())
    np.testing.assert_array_equal(np.asarray(o.edge_index),
                                  r.edge_index.numpy())
    np.testing.assert_allclose(np.asarray(o.x), r.x.numpy())


def test_bitcoin_otc_oracle(tmp_path):
    import torch_geometric.datasets as RD
    import pytorch_geometric_tpu.datasets as OD
    import os
    rng = np.random.default_rng(9)
    day = 24 * 3600
    lines = []
    t = 1_300_000_000
    for _ in range(60):
        s, d = rng.integers(1, 30, 2)
        while d == s:
            d = rng.integers(1, 30)
        r = int(rng.integers(-10, 11))
        t += int(rng.integers(0, 5 * day))
        lines.append(f'{s},{d},{r},{t}.0')
    for root in ('ref', 'ours'):
        raw = str(tmp_path / root / 'raw')
        os.makedirs(raw, exist_ok=True)
        with open(osp.join(raw, 'soc-sign-bitcoinotc.csv'), 'w') as fh:
            fh.write('\n'.join(lines) + '\n')

    class NoDownload(RD.BitcoinOTC):
        def download(self):
            pass

    r = NoDownload(str(tmp_path / 'ref'))
    o = OD.BitcoinOTC(str(tmp_path / 'ours'))
    assert len(o) == len(r)
    for i in range(len(r)):
        np.testing.assert_array_equal(np.asarray(o[i].edge_index),
                                      r[i].edge_index.numpy())
        np.testing.assert_array_equal(np.asarray(o[i].edge_attr),
                                      r[i].edge_attr.numpy())
        assert o[i].num_nodes == r[i].num_nodes
