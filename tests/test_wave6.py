"""IBMB loader, graphgym grid/agg, model hub tests."""
import os.path as osp

import numpy as np

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.graphgym import (set_cfg, configs_gen, train,
                                            agg_runs, agg_batch)
from pytorch_geometric_tpu.loader import IBMBNodeLoader
from pytorch_geometric_tpu.nn import PyGModelHubMixin

rng = np.random.default_rng(0)


def test_ibmb_covers_outputs():
    n = 60
    coo = np.stack([rng.integers(0, n, 240),
                    rng.integers(0, n, 240)]).astype(np.int32)
    data = Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, 3, n), num_nodes=n)
    loader = IBMBNodeLoader(data, output_indices=np.arange(40),
                            num_nodes_per_batch=10,
                            num_auxiliary_nodes=15)
    outs = []
    for b in loader:
        m = np.asarray(b.output_node_mask)
        outs.extend(np.asarray(b.n_id)[m].tolist())
        # aux nodes beyond outputs exist
        assert b.num_nodes >= m.sum()
    assert sorted(outs) == list(range(40))


def test_configs_gen_and_agg(tmp_path):
    c = set_cfg()
    c.optim.max_epoch = 2
    c.dataset.avg_num_nodes = 50
    c.gnn.dim_inner = 8
    cfgs = configs_gen(c, {'gnn.dim_inner': [8, 16]})
    assert [cc.gnn.dim_inner for cc in cfgs] == [8, 16]
    for i, cc in enumerate(cfgs):
        # experiment dir per grid point, seed dirs inside (the layout
        # graphgym.main writes and agg.py consumes)
        train(cc, run_dir=osp.join(str(tmp_path), f'run-d={8 * (i+1)}',
                                   'seed_0'))
    res = agg_runs(osp.join(str(tmp_path), 'run-d=8'))
    assert 'train' in res and 'accuracy' in res['train']
    rows = agg_batch(str(tmp_path))
    assert len(rows) == 2
    assert {r['d'] for r in rows} == {8, 16}


def test_model_hub_roundtrip(tmp_path):
    import jax.numpy as jnp
    PyGModelHubMixin.save_pretrained(str(tmp_path),
                                     {'w': jnp.ones((3, 2))},
                                     config={'hidden': 4})
    params, cfg = PyGModelHubMixin.from_pretrained(str(tmp_path))
    assert cfg['hidden'] == 4
    np.testing.assert_allclose(params['w'], 1.0)


def test_ibmb_batch_loader_partitions_cover_inputs():
    n = 60
    coo = np.stack([rng.integers(0, n, 240),
                    rng.integers(0, n, 240)]).astype(np.int32)
    data = Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, 3, n), num_nodes=n)
    from pytorch_geometric_tpu.loader import IBMBBatchLoader
    loader = IBMBBatchLoader(data, num_partitions=4,
                             input_nodes=np.arange(40),
                             batch_expand_ratio=1.5)
    outs = []
    for b in loader:
        m = np.asarray(b.output_node_mask)
        outs.extend(np.asarray(b.n_id)[m].tolist())
        assert b.num_nodes >= m.sum()  # aux expansion present
    assert sorted(outs) == list(range(40))


def test_add_gpse_transform():
    import jax
    from pytorch_geometric_tpu.nn.models.gpse import GPSE
    from pytorch_geometric_tpu.transforms import AddGPSE
    n = 12
    coo = np.stack([rng.integers(0, n, 40),
                    rng.integers(0, n, 40)]).astype(np.int32)
    data = Data(x=rng.standard_normal((n, 4)).astype(np.float32),
                edge_index=coo, num_nodes=n)
    model = GPSE(dim_in=8, dim_out=6, dim_hidden=16, num_layers=2)
    x0 = np.zeros((n, 8), np.float32)
    params = model.init(jax.random.PRNGKey(0), x0, data.edge_index)
    out = AddGPSE(model, params)(data)
    assert out.pestat_GPSE.shape == (n, 6)
    assert np.all(np.isfinite(np.asarray(out.pestat_GPSE)))
