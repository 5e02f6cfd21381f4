"""Dataset-parser oracle tests: write ONE synthetic raw-file set per
format, parse it with the reference PyG dataset class AND ours, and
compare tensors. Pins parser semantics (planetoid test-row reordering +
self-loop/dup handling, TU one-hot labels, CitationFull npz CSR,
MD17 npz) that self-consistency tests cannot."""
import os.path as osp
import pickle
import sys

import numpy as np
import pytest
import scipy.sparse as sp

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

rng = np.random.default_rng(3)


def _sorted_edges(coo):
    coo = np.asarray(coo).astype(np.int64)
    order = np.lexsort((coo[1], coo[0]))
    return coo[:, order]


def _write_planetoid_raw(raw_dir, n_tr=20, n_mid=510, n_te=30, f=8, c=3):
    """Cora-format pickles: allx/ally cover [0, n_tr+n_mid); tx/ty rows
    are in (shuffled) test.index order; the graph dict is symmetric and
    salted with self-loops + duplicate edges (the reference strips and
    dedupes them, io/planetoid.py:139-143)."""
    import os
    os.makedirs(raw_dir, exist_ok=True)
    n_all = n_tr + n_mid
    n = n_all + n_te
    allx = sp.csr_matrix(
        (rng.random((n_all, f)) * (rng.random((n_all, f)) < 0.3))
        .astype(np.float32))
    x = allx[:n_tr]
    onehot = np.eye(c, dtype=np.int32)
    ally = onehot[rng.integers(0, c, n_all)]
    y = ally[:n_tr]
    test_index = rng.permutation(np.arange(n_all, n))
    tx_rows = (rng.random((n_te, f)) *
               (rng.random((n_te, f)) < 0.3)).astype(np.float32)
    tx = sp.csr_matrix(tx_rows)          # row j = node test_index[j]
    ty = onehot[rng.integers(0, c, n_te)]
    graph = {i: [] for i in range(n)}
    for _ in range(4 * n):
        a, b = rng.integers(0, n, 2)
        graph[int(a)].append(int(b))
        graph[int(b)].append(int(a))     # symmetric, with duplicates
    for i in range(0, n, 7):
        graph[i].append(i)               # self-loops
    names = {'x': x, 'tx': tx, 'allx': allx, 'y': y, 'ty': ty,
             'ally': ally, 'graph': graph}
    for nm, obj in names.items():
        with open(osp.join(raw_dir, f'ind.cora.{nm}'), 'wb') as fh:
            pickle.dump(obj, fh)
    with open(osp.join(raw_dir, 'ind.cora.test.index'), 'w') as fh:
        fh.write('\n'.join(str(i) for i in test_index) + '\n')


def test_planetoid_oracle(tmp_path):
    ref_root, our_root = str(tmp_path / 'ref'), str(tmp_path / 'ours')
    _write_planetoid_raw(osp.join(ref_root, 'Cora', 'raw'))
    # identical raw bytes for ours
    import shutil
    shutil.copytree(osp.join(ref_root, 'Cora', 'raw'),
                    osp.join(our_root, 'cora', 'raw'))

    ref = tg.datasets.Planetoid(ref_root, 'Cora')[0]
    from pytorch_geometric_tpu.datasets import Planetoid
    ours = Planetoid(our_root, 'Cora')[0]

    np.testing.assert_allclose(np.asarray(ours.x), ref.x.numpy(),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.y), ref.y.numpy())
    np.testing.assert_array_equal(_sorted_edges(ours.edge_index),
                                  _sorted_edges(ref.edge_index.numpy()))
    for k in ('train_mask', 'val_mask', 'test_mask'):
        np.testing.assert_array_equal(
            np.asarray(getattr(ours, k)), getattr(ref, k).numpy())


TU_FILES = {
    'TOY_A.txt': '1, 2\n2, 1\n2, 3\n3, 2\n3, 1\n1, 3\n4, 5\n5, 4\n',
    'TOY_graph_indicator.txt': '1\n1\n1\n2\n2\n',
    'TOY_graph_labels.txt': '1\n-1\n',
    'TOY_node_labels.txt': '0\n1\n0\n1\n0\n',
}


def test_tu_dataset_oracle(tmp_path):
    import os
    for base in ('ref', 'ours'):
        raw = tmp_path / base / 'TOY' / 'raw'
        os.makedirs(raw)
        for fn, content in TU_FILES.items():
            (raw / fn).write_text(content)

    ref = tg.datasets.TUDataset(str(tmp_path / 'ref'), 'TOY')
    from pytorch_geometric_tpu.datasets import TUDataset
    ours = TUDataset(str(tmp_path / 'ours'), 'TOY')
    assert len(ref) == len(ours) == 2
    for i in range(2):
        r, o = ref[i], ours[i]
        np.testing.assert_array_equal(np.asarray(o.x), r.x.numpy())
        np.testing.assert_array_equal(np.asarray(o.y).reshape(-1),
                                      r.y.numpy().reshape(-1))
        np.testing.assert_array_equal(_sorted_edges(o.edge_index),
                                      _sorted_edges(r.edge_index.numpy()))


def _write_citation_npz(raw_dir, n=25, f=8, c=3):
    import os
    os.makedirs(raw_dir, exist_ok=True)
    adj = sp.random(n, n, 0.2, format='csr', random_state=0)
    attr = sp.random(n, f, 0.5, format='csr', random_state=1)
    np.savez(osp.join(raw_dir, 'cora.npz'), adj_data=adj.data,
             adj_indices=adj.indices, adj_indptr=adj.indptr,
             adj_shape=adj.shape, attr_data=attr.data,
             attr_indices=attr.indices, attr_indptr=attr.indptr,
             attr_shape=attr.shape,
             labels=rng.integers(0, c, n))


def test_citation_full_oracle(tmp_path):
    import shutil
    _write_citation_npz(osp.join(str(tmp_path), 'ref', 'cora', 'raw'))
    shutil.copytree(osp.join(str(tmp_path), 'ref', 'cora', 'raw'),
                    osp.join(str(tmp_path), 'ours', 'cora', 'raw'))
    ref = tg.datasets.CitationFull(osp.join(str(tmp_path), 'ref'),
                                   'Cora')[0]
    from pytorch_geometric_tpu.datasets import CitationFull
    ours = CitationFull(osp.join(str(tmp_path), 'ours'), 'cora')[0]
    np.testing.assert_allclose(np.asarray(ours.x), ref.x.numpy(),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.y), ref.y.numpy())
    np.testing.assert_array_equal(_sorted_edges(ours.edge_index),
                                  _sorted_edges(ref.edge_index.numpy()))


def test_md17_oracle(tmp_path):
    import os
    z = np.array([1, 6, 8])
    R = rng.standard_normal((4, 3, 3)).astype(np.float64)
    E = rng.standard_normal(4)
    F = rng.standard_normal((4, 3, 3))
    ref_raw = tmp_path / 'ref' / 'aspirin' / 'raw'
    os.makedirs(ref_raw)
    np.savez(ref_raw / 'md17_aspirin.npz', z=z, R=R, E=E, F=F)
    our_raw = tmp_path / 'ours' / 'aspirin' / 'raw'
    os.makedirs(our_raw)
    np.savez(our_raw / 'aspirin.npz', z=z, R=R, E=E, F=F)

    ref = tg.datasets.MD17(str(tmp_path / 'ref'), 'aspirin')
    from pytorch_geometric_tpu.datasets import MD17
    ours = MD17(str(tmp_path / 'ours'), 'aspirin')
    assert len(ref) == len(ours) == 4
    for i in (0, 3):
        r, o = ref[i], ours[i]
        np.testing.assert_array_equal(np.asarray(o.z), r.z.numpy())
        np.testing.assert_allclose(np.asarray(o.pos), r.pos.numpy(),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(o.force), r.force.numpy(),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(o.energy).reshape(()), float(r.energy), rtol=1e-6)
