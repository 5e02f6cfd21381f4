"""Datamodule / datapipes / small-pool-op tests (reference
``test/data/lightning/test_datamodule.py``, ``test/data/test_datapipes.py``,
``test/nn/pool/test_pan_pool.py``, ``test/nn/pool/test_decimation.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.data import (Batcher, Data, DatasetAdapter,
                                        LightningDataset, LightningLinkData,
                                        LightningNodeData)
from pytorch_geometric_tpu.datasets import FakeDataset
from pytorch_geometric_tpu.nn.pool import (PANPooling, approx_knn,
                                           decimation_indices)
from pytorch_geometric_tpu.profile import count_flops


@pytest.fixture(scope='module')
def graph_ds():
    return FakeDataset(num_graphs=8, avg_num_nodes=12, num_channels=4)


def test_lightning_dataset(graph_ds):
    dm = LightningDataset(graph_ds, val_dataset=graph_ds, batch_size=4)
    batches = list(dm.train_dataloader())
    assert len(batches) == 2
    assert batches[0].x.ndim == 2
    assert len(list(dm.val_dataloader())) == 2
    with pytest.raises(ValueError, match='test_dataset'):
        dm.test_dataloader()


def test_lightning_node_data():
    rng = np.random.default_rng(0)
    d = Data(x=rng.normal(size=(100, 4)).astype(np.float32),
             edge_index=rng.integers(0, 100, size=(2, 400)))
    d.train_mask = np.arange(100) < 60
    dm = LightningNodeData(d, num_neighbors=[5], batch_size=16)
    sub = next(iter(dm.train_dataloader()))
    assert sub.n_id.shape[0] > 0
    with pytest.raises(ValueError, match='val'):
        dm.val_dataloader()
    full = LightningNodeData(d, loader='full')
    assert next(iter(full.train_dataloader())) is d


def test_lightning_link_data():
    rng = np.random.default_rng(1)
    d = Data(x=rng.normal(size=(50, 4)).astype(np.float32),
             edge_index=rng.integers(0, 50, size=(2, 200)))
    ein = rng.integers(0, 50, size=(2, 32))
    dm = LightningLinkData(d, input_train_edges=ein, num_neighbors=[5],
                           batch_size=8)
    sub = next(iter(dm.train_dataloader()))
    assert sub.edge_label_index.shape[-1] == 8


def test_datapipes(graph_ds):
    pipe = Batcher(DatasetAdapter(graph_ds), batch_size=4,
                   max_num_nodes=128, max_num_edges=512)
    batches = list(pipe)
    assert len(batches) == 2
    assert batches[0].x.shape[0] == 128


def test_pan_pooling():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    ei = jnp.asarray(rng.integers(0, 20, size=(2, 60)))
    m = PANPooling(in_channels=8, ratio=0.5)
    params = m.init(jax.random.PRNGKey(0), x, ei)
    out = m.apply(params, x, ei)
    assert out.x.shape == (10, 8)
    assert int(out.node_mask.sum()) == 10


def test_decimation_and_approx_knn():
    rng = np.random.default_rng(3)
    ptr = jnp.asarray(np.array([0, 8, 10, 17], np.int64))
    idx, new_ptr = decimation_indices(ptr, 4)
    # per-cloud counts: floor(8/4)=2, max(1, floor(2/4))=1, floor(7/4)=1
    assert list(np.asarray(new_ptr)) == [0, 2, 3, 4]
    idx = np.asarray(idx)
    assert (idx[:2] >= 0).all() and (idx[:2] < 8).all()
    assert 8 <= idx[2] < 10 and 10 <= idx[3] < 17
    pts = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    ei, valid = approx_knn(pts, pts, 4)
    assert ei.shape == (2, 64)
    assert bool(valid.all())


def test_count_flops():
    c = count_flops(lambda a, b: a @ b, jnp.ones((64, 64)),
                    jnp.ones((64, 64)))
    assert c['flops'] >= 2 * 64 ** 3 * 0.9
