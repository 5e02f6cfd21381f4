"""DNA/PAN convs, BasicGNN.inference, npz parsers, TemporalDataLoader,
graphgym CLI."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_geometric_tpu.nn as pgnn
from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.datasets import (FakeDataset, WebKB, Amazon,
                                            read_npz)
from pytorch_geometric_tpu.loader import TemporalDataLoader
from pytorch_geometric_tpu.nn.models import (GCN, TemporalData,
                                             basic_gnn_inference)

rng = np.random.default_rng(0)


def test_dna_pan():
    n, L, F = 10, 3, 8
    x = jnp.asarray(rng.standard_normal((n, L, F)).astype(np.float32))
    coo = jnp.asarray(np.stack([rng.integers(0, n, 30),
                                rng.integers(0, n, 30)]).astype(np.int32))
    mod = pgnn.DNAConv(channels=8, heads=2)
    params = mod.init(jax.random.PRNGKey(0), x, coo)
    out = mod.apply(params, x, coo)
    assert out.shape == (n, 8)

    x2 = jnp.asarray(rng.standard_normal((n, F)).astype(np.float32))
    mod = pgnn.PANConv(out_channels=8, filter_size=3)
    params = mod.init(jax.random.PRNGKey(0), x2, coo)
    out, M = mod.apply(params, x2, coo)
    assert out.shape == (n, 8)
    assert M.shape == (n, n)


def test_layerwise_inference_matches_full():
    from pytorch_geometric_tpu.nn import gcn_norm
    data = FakeDataset(num_graphs=1, avg_num_nodes=120, avg_degree=6,
                       num_channels=8, num_classes=3, seed=0)[0]
    n = data.num_nodes
    # precompute full-graph GCN norms (reference inference protocol:
    # cached normalisation, layer-wise sampling of raw edges)
    coo_n, w = gcn_norm(jnp.asarray(np.asarray(data.edge_index)), None,
                        n)
    data = data.replace(edge_index=np.asarray(coo_n))
    model = GCN(hidden_channels=16, num_layers=2, out_channels=3,
                conv_kwargs={'normalize': False,
                             'add_self_loops': False})
    x = jnp.asarray(np.asarray(data.x))
    params = model.init(jax.random.PRNGKey(0), x, coo_n, edge_weight=w)
    full = np.asarray(model.apply(params, x, coo_n, edge_weight=w))
    layerwise = np.asarray(basic_gnn_inference(
        model, params, data, batch_size=64,
        num_neighbors_per_layer=n, edge_weight=np.asarray(w)))
    # with full 1-hop neighborhoods per layer the results must agree
    np.testing.assert_allclose(layerwise, full, rtol=1e-3, atol=1e-3)


def test_read_npz(tmp_path):
    import scipy.sparse as sp
    n = 12
    adj = sp.random(n, n, density=0.3, format='csr',
                    random_state=0)
    attr = sp.random(n, 6, density=0.5, format='csr', random_state=1)
    path = str(tmp_path / 'amazon_electronics_photo.npz')
    np.savez(path, adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=adj.shape,
             attr_data=attr.data, attr_indices=attr.indices,
             attr_indptr=attr.indptr, attr_shape=attr.shape,
             labels=rng.integers(0, 4, n))
    data = read_npz(path)
    assert data.num_nodes == n and data.x.shape == (n, 6)
    # undirected
    coo = np.asarray(data.edge_index)
    s = set(map(tuple, coo.T))
    assert all((d, a) in s for a, d in coo.T)

    raw = tmp_path / 'photo' / 'photo' / 'raw'
    raw.mkdir(parents=True)
    import shutil
    shutil.copy(path, raw / 'amazon_electronics_photo.npz')
    ds = Amazon(root=str(tmp_path / 'photo'), name='photo')
    assert ds[0].num_nodes == n


def test_webkb_parser(tmp_path):
    raw = tmp_path / 'cornell' / 'cornell' / 'raw'
    raw.mkdir(parents=True)
    (raw / 'out1_node_feature_label.txt').write_text(
        'id\tfeat\tlabel\n0\t1,0,1\t0\n1\t0,1,0\t1\n2\t1,1,0\t0\n')
    (raw / 'out1_graph_edges.txt').write_text('src\tdst\n0\t1\n1\t2\n')
    ds = WebKB(root=str(tmp_path / 'cornell'), name='cornell')
    data = ds[0]
    assert data.num_nodes == 3 and data.x.shape == (3, 3)
    # reference webkb.py:119 only coalesces — direction is kept
    assert data.num_edges == 2
    coo = np.asarray(data.edge_index)
    assert set(map(tuple, coo.T)) == {(0, 1), (1, 2)}


def test_temporal_loader():
    td = TemporalData(src=rng.integers(0, 10, 25),
                      dst=rng.integers(0, 10, 25),
                      t=np.sort(rng.random(25)))
    loader = TemporalDataLoader(td, batch_size=10,
                                neg_sampling_ratio=1.0)
    batches = list(loader)
    assert len(batches) == 3
    assert len(batches[0].src) == 10
    assert batches[0].neg_dst.shape == (10,)
    # chronological
    assert batches[0].t.max() <= batches[1].t.min() + 1e-9


def test_graphgym_cli(tmp_path):
    out = subprocess.run(
        [sys.executable, '-m', 'pytorch_geometric_tpu.graphgym.main',
         '--repeat', '1', 'optim.max_epoch', '2', 'out_dir',
         str(tmp_path), 'dataset.avg_num_nodes', '60',
         'gnn.dim_inner', '8'],
        capture_output=True, text=True, timeout=300,
        env={**__import__('os').environ, 'JAX_PLATFORMS': 'cpu'})
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'seed 0:' in out.stdout
