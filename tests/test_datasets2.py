"""Mesh/molecular/temporal dataset parser tests."""
import numpy as np
import pytest

from pytorch_geometric_tpu.datasets import (ModelNet, MD17, QM9,
                                            MovieLens, JODIEDataset,
                                            parse_sdf)

SDF = """mol1
  test

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 O   0  0  0  0  0
    0.9600    0.0000    0.0000 H   0  0  0  0  0
   -0.2400    0.9300    0.0000 H   0  0  0  0  0
  1  2  1  0
  1  3  1  0
M  END
"""


def test_parse_sdf():
    d = parse_sdf(SDF)
    assert d.num_nodes == 3
    assert list(np.asarray(d.z)) == [8, 1, 1]
    assert d.edge_index.shape == (2, 4)  # both directions
    assert d.edge_attr.shape == (4, 4)


def test_qm9(tmp_path):
    raw = tmp_path / 'raw'
    raw.mkdir()
    (raw / 'gdb9.sdf').write_text(SDF + '$$$$\n' + SDF + '$$$$\n')
    (raw / 'gdb9.sdf.csv').write_text(
        'id,a,b\nm1,1.0,2.0\nm2,3.0,4.0\n')
    ds = QM9(root=str(tmp_path))
    assert len(ds) == 2
    assert np.asarray(ds[1].y).reshape(-1).tolist() == [3.0, 4.0]


def test_modelnet(tmp_path):
    raw = tmp_path / 'modelnet10_train' / 'raw' / 'chair' / 'train'
    raw.mkdir(parents=True)
    (raw / 'chair_0001.off').write_text(
        'OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n')
    ds = ModelNet(root=str(tmp_path), name='10', train=True)
    assert len(ds) == 1
    assert ds[0].pos.shape == (3, 3)
    assert int(np.asarray(ds[0].y)[0]) == 0


def test_md17(tmp_path):
    raw = tmp_path / 'aspirin' / 'raw'
    raw.mkdir(parents=True)
    np.savez(raw / 'aspirin.npz', z=np.array([1, 6]),
             R=np.random.randn(5, 2, 3),
             E=np.random.randn(5), F=np.random.randn(5, 2, 3))
    ds = MD17(root=str(tmp_path), name='aspirin')
    assert len(ds) == 5
    assert ds[0].pos.shape == (2, 3)
    assert ds[0].force.shape == (2, 3)


def test_movielens(tmp_path):
    raw = tmp_path / 'raw'
    raw.mkdir()
    (raw / 'ratings.csv').write_text(
        'userId,movieId,rating\n1,10,4.0\n1,20,3.0\n2,10,5.0\n')
    ds = MovieLens(root=str(tmp_path))
    data = ds[0]
    assert data['user'].x.shape[0] == 2
    assert data['movie'].x.shape[0] == 2
    et = ('user', 'rates', 'movie')
    assert data[et].edge_index.shape == (2, 3)


def test_jodie(tmp_path):
    raw = tmp_path / 'wikipedia' / 'raw'
    raw.mkdir(parents=True)
    (raw / 'wikipedia.csv').write_text(
        'user,item,time,label,f1,f2\n'
        '0,0,1.0,0,0.1,0.2\n1,0,2.0,0,0.3,0.4\n0,1,3.0,1,0.5,0.6\n')
    ds = JODIEDataset(root=str(tmp_path), name='wikipedia')
    td = ds[0]
    assert td.num_events == 3
    assert td.msg.shape == (3, 2)
    # items offset past users
    assert td.dst.min() >= td.src.max() + 1
