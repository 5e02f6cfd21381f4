"""Batch collation parity vs the reference PyG oracle: disjoint-union
offsets for edge_index/face, batch/ptr vectors, attribute concat."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
from torch_geometric.data import Batch as RefBatch, Data as RefData

from pytorch_geometric_tpu.data import Batch, Data

rng = np.random.default_rng(8)


def make_pair(i):
    n = int(rng.integers(4, 9))
    e = int(rng.integers(3, 12))
    x = rng.standard_normal((n, 4)).astype(np.float32)
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int64)
    ea = rng.standard_normal((e, 2)).astype(np.float32)
    y = np.array([i % 3])
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    face = rng.integers(0, n, (3, 5)).astype(np.int64)
    ours = Data(x=x, edge_index=coo, edge_attr=ea, y=y, pos=pos,
                face=face, num_nodes=n)
    ref = RefData(x=torch.from_numpy(x),
                  edge_index=torch.from_numpy(coo).contiguous(),
                  edge_attr=torch.from_numpy(ea),
                  y=torch.from_numpy(y),
                  pos=torch.from_numpy(pos),
                  face=torch.from_numpy(face).contiguous(), num_nodes=n)
    return ours, ref


def test_batch_collation_matches_reference():
    pairs = [make_pair(i) for i in range(5)]
    ob = Batch.from_data_list([p[0] for p in pairs])
    rb = RefBatch.from_data_list([p[1] for p in pairs])

    def arr(v):
        return np.asarray(getattr(v, 'coo', v))

    np.testing.assert_array_equal(arr(ob.edge_index),
                                  rb.edge_index.numpy())
    np.testing.assert_array_equal(np.asarray(ob.face), rb.face.numpy())
    np.testing.assert_allclose(np.asarray(ob.x), rb.x.numpy())
    np.testing.assert_allclose(np.asarray(ob.edge_attr),
                               rb.edge_attr.numpy())
    np.testing.assert_array_equal(np.asarray(ob.y).reshape(-1),
                                  rb.y.numpy().reshape(-1))
    np.testing.assert_array_equal(np.asarray(ob.batch),
                                  rb.batch.numpy())
    np.testing.assert_array_equal(np.asarray(ob.ptr), rb.ptr.numpy())
    assert ob.num_graphs == rb.num_graphs


def test_batch_roundtrip_separate():
    pairs = [make_pair(i) for i in range(4)]
    ob = Batch.from_data_list([p[0] for p in pairs])
    back = ob.to_data_list()
    assert len(back) == 4
    for orig, rec in zip([p[0] for p in pairs], back):
        np.testing.assert_allclose(np.asarray(rec.x),
                                   np.asarray(orig.x))
        np.testing.assert_array_equal(
            np.asarray(getattr(rec.edge_index, 'coo', rec.edge_index)),
            np.asarray(orig.edge_index))
