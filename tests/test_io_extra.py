"""io layer: SDF parser, TU reader, fsspec abstraction, npz parser
(reference ``torch_geometric/io/{sdf,tu,fs,npz}.py``)."""
import numpy as np
import pytest

from pytorch_geometric_tpu.io import (parse_sdf, read_tu_data,
                                      parse_npz, fs)

SDF = """mol
  prog
comment
  3  2  0  0
    0.0000    0.0000    0.0000 C   0
    1.5000    0.0000    0.0000 O   0
    0.0000    1.1000    0.0000 H   0
  1  2  2  0
  1  3  1  0
"""


def test_parse_sdf():
    d = parse_sdf(SDF)
    assert d.x.shape == (3, 5)
    assert d.pos.shape == (3, 3)
    # undirected + coalesced: 2 bonds -> 4 directed edges
    assert d.edge_index.shape == (2, 4)
    # 1-D bond types (reference parse_txt_array squeezes one column)
    assert d.edge_attr.shape == (4,)
    # double bond 1-2 has label 1 (bond order - 1)
    e = d.edge_index
    m = (e[0] == 0) & (e[1] == 1)
    assert float(d.edge_attr[np.nonzero(m)[0][0]]) == 1.0


def test_read_tu_data(tmp_path):
    p = 'T'
    (tmp_path / f'{p}_A.txt').write_text(
        '1, 2\n2, 1\n3, 4\n4, 3\n')
    (tmp_path / f'{p}_graph_indicator.txt').write_text('1\n1\n2\n2\n')
    (tmp_path / f'{p}_graph_labels.txt').write_text('1\n2\n')
    (tmp_path / f'{p}_node_labels.txt').write_text('0\n1\n1\n0\n')
    data_list, sizes = read_tu_data(str(tmp_path), p)
    assert len(data_list) == 2
    assert sizes['num_node_labels'] == 2
    d0, d1 = data_list
    assert d0.num_nodes == 2 and d1.num_nodes == 2
    assert d0.edge_index.shape == (2, 2)
    # second graph's edges relabelled to local ids
    assert int(d1.edge_index.max()) == 1
    assert int(d0.y[0]) == 0 and int(d1.y[0]) == 1
    assert d0.x.shape == (2, 2)


def test_parse_npz():
    import scipy.sparse as sp
    n, f = 6, 4
    rng = np.random.default_rng(0)
    attr = sp.csr_matrix((rng.random((n, f)) > 0.5).astype(np.float32))
    adj = sp.csr_matrix(np.triu(rng.random((n, n)) > 0.6, 1))
    d = parse_npz({
        'attr_data': attr.data, 'attr_indices': attr.indices,
        'attr_indptr': attr.indptr, 'attr_shape': attr.shape,
        'adj_data': adj.data, 'adj_indices': adj.indices,
        'adj_indptr': adj.indptr, 'adj_shape': adj.shape,
        'labels': rng.integers(0, 3, n),
    })
    assert d.x.shape == (n, f)
    assert set(np.unique(d.x)) <= {0.0, 1.0}
    e = np.asarray(d.edge_index)
    # undirected: edge set symmetric
    fwd = set(map(tuple, e.T.tolist()))
    assert all((b, a) in fwd for a, b in fwd)


def test_fs_memory_backend():
    fsspec = pytest.importorskip('fsspec')
    del fsspec
    fs.save({'x': np.arange(5)}, 'memory://pgt_t/obj.pkl')
    assert fs.exists('memory://pgt_t/obj.pkl')
    assert fs.load('memory://pgt_t/obj.pkl')['x'].sum() == 10
    assert any('obj.pkl' in p for p in fs.ls('memory://pgt_t'))
    assert not fs.isdisk('memory://pgt_t/obj.pkl')
    assert fs.islocal('memory://pgt_t/obj.pkl')
    fs.rm('memory://pgt_t')
    assert not fs.exists('memory://pgt_t/obj.pkl')


def test_fs_local(tmp_path):
    path = str(tmp_path / 'a' / 'b.pkl')
    fs.torch_save([1, 2, 3], path)
    assert fs.torch_load(path) == [1, 2, 3]
    assert fs.isdisk(path)
