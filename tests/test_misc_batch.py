"""Tests for the long-tail utils/transforms/aux batches (reference
``test/utils/``, ``test/transforms/``, ``test/graphgym/``)."""

import os.path as osp
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu import utils as U
from pytorch_geometric_tpu.data import Data
import pytorch_geometric_tpu.transforms as T

rng = np.random.default_rng(0)


def _data(n=24, e=80):
    return Data(x=rng.normal(size=(n, 4)).astype(np.float32),
                edge_index=rng.integers(0, n, (2, e)),
                pos=rng.normal(size=(n, 3)).astype(np.float32))


class TestUtilsMisc:
    def test_masks(self):
        m = U.index_to_mask(jnp.asarray([0, 3]), 6)
        assert m.tolist() == [True, False, False, True, False, False]
        np.testing.assert_array_equal(np.asarray(U.mask_to_index(m)),
                                      [0, 3])
        x = jnp.arange(12).reshape(6, 2)
        assert U.mask_select(x, 0, m).shape == (2, 2)
        assert U.narrow(x, 0, 2, 3).shape == (3, 2)

    def test_generators_shapes(self):
        er = U.erdos_renyi_graph(30, 0.1, seed=1)
        assert er.shape[0] == 2
        ba = U.barabasi_albert_graph(30, 3, seed=1)
        assert int(ba.max()) < 30
        sbm = U.stochastic_blockmodel_graph(
            [15, 15], [[0.3, 0.01], [0.01, 0.3]], seed=1)
        # homophilous by construction
        block = (sbm >= 15).astype(int)
        assert (block[0] == block[1]).mean() > 0.7

    def test_structured_negative_sampling(self):
        coo = rng.integers(0, 20, (2, 50))
        i, j, k = U.structured_negative_sampling(coo, 20)
        existing = set(map(tuple, coo.T.tolist()))
        bad = sum((int(a), int(c)) in existing for a, c in zip(i, k))
        assert bad <= 2   # best-effort corruption
        assert U.structured_negative_sampling_feasible(coo, 20)

    def test_self_loop_helpers(self):
        coo = np.array([[0, 1, 2, 2], [0, 2, 2, 1]])
        attr = np.arange(4.0)
        out = U.get_self_loop_attr(jnp.asarray(coo), jnp.asarray(attr),
                                   num_nodes=3)
        np.testing.assert_allclose(np.asarray(out), [0.0, 0.0, 2.0])
        e, ea, loops, la = U.segregate_self_loops(coo, attr)
        assert e.shape[1] == 2 and loops.shape[1] == 2

    def test_mesh_and_geodesic(self):
        pos = rng.normal(size=(8, 3)).astype(np.float32)
        face = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6],
                         [6, 7, 0]]).T
        L, w = U.get_mesh_laplacian(pos, face)
        assert L.shape[0] == 2 and len(w) == L.shape[1]
        d = U.geodesic_distance(pos, face, src=np.array([0]))
        assert d.shape == (1, 8) and d[0, 0] == 0

    def test_nested_and_sparse(self):
        xs = U.to_nested_tensor(np.arange(12).reshape(6, 2),
                                batch=np.repeat([0, 1, 2], 2))
        assert len(xs) == 3
        cat, b = U.from_nested_tensor(xs, return_batch=True)
        assert cat.shape == (6, 2) and b.tolist() == [0, 0, 1, 1, 2, 2]
        coo = rng.integers(0, 10, (2, 20))
        m = U.to_scipy_csr(coo, size=10)
        ei, w = U.to_edge_index(m)
        assert ei.shape[1] <= 20   # duplicates coalesced by scipy
        assert U.is_torch_sparse_tensor(m)

    def test_num_hops_and_embeddings(self):
        from pytorch_geometric_tpu.nn.models import GCN
        m = GCN(hidden_channels=8, num_layers=3, out_channels=2)
        d = _data()
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(d.x),
                        jnp.asarray(d.edge_index))
        embs = U.get_embeddings(m, params, jnp.asarray(d.x),
                                jnp.asarray(d.edge_index))
        assert len(embs) >= 3   # one per conv layer

    def test_gated_bridges(self):
        for fn in (U.to_dgl, U.from_cugraph, U.to_networkit,
                   U.from_trimesh):
            with pytest.raises(ImportError):
                fn(None)


class TestTransformsMisc:
    def test_structural(self):
        d = T.AddRemainingSelfLoops()(_data())
        coo = np.asarray(d.edge_index)
        # padding-first: existing loops stay (zero-weighted); one fresh
        # loop per node is appended at the tail
        tail = coo[:, -d.num_nodes:]
        np.testing.assert_array_equal(tail[0], tail[1])
        np.testing.assert_array_equal(np.sort(tail[0]),
                                      np.arange(d.num_nodes))
        d = T.LargestConnectedComponents()(_data())
        assert d.num_nodes >= 1
        d = T.ToDense(num_nodes=30)(_data())
        assert d.adj.shape == (30, 30) and d.x.shape[0] == 30

    def test_geometric_chain(self):
        d = T.Delaunay()(_data())
        d = T.GenerateMeshNormals()(d)
        d = T.PointPairFeatures()(d)
        assert d.edge_attr.shape[-1] == 4
        d2 = T.NormalizeRotation()(_data())
        assert d2.pos.shape == (24, 3)

    def test_splits_and_filters(self):
        d = _data()
        d.y = rng.integers(0, 3, 24)
        d = T.NodePropertySplit('popularity',
                                [0.4, 0.1, 0.1, 0.2, 0.2])(d)
        total = sum(int(np.asarray(d[k]).sum()) for k in
                    ('id_train_mask', 'id_val_mask', 'id_test_mask',
                     'ood_val_mask', 'ood_test_mask'))
        assert total == 24
        assert T.ComposeFilters([lambda d: True,
                                 lambda d: d.num_nodes > 3])(_data())


class TestAux:
    def test_checkpoint_roundtrip(self):
        from pytorch_geometric_tpu.checkpoint import (latest_step,
                                                      load_checkpoint,
                                                      save_checkpoint)
        tree = {'a': jnp.arange(6.0).reshape(2, 3),
                'b': {'c': jnp.ones((4,))}}
        root = tempfile.mkdtemp()
        save_checkpoint(osp.join(root, 'ck'), tree, step=3)
        assert latest_step(osp.join(root, 'ck')) == 3
        back = load_checkpoint(osp.join(root, 'ck'), step=3)
        np.testing.assert_array_equal(np.asarray(back['a']),
                                      np.arange(6).reshape(2, 3))

    def test_graphgym_optim_loss(self):
        import optax
        from pytorch_geometric_tpu.graphgym import (OptimizerConfig,
                                                    SchedulerConfig,
                                                    compute_loss,
                                                    create_optimizer,
                                                    create_scheduler)
        tx = create_optimizer(
            OptimizerConfig(optimizer='sgd', base_lr=0.1),
            create_scheduler(SchedulerConfig('step', steps=(2, 4))))
        p = {'w': jnp.ones(3)}
        st = tx.init(p)
        up, _ = tx.update({'w': jnp.ones(3)}, st, p)
        assert np.isfinite(np.asarray(up['w'])).all()
        l, out = compute_loss(
            jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 4, 6)))
        assert np.isfinite(float(l))
        l2, _ = compute_loss(jnp.zeros(5), jnp.ones(5), task='mae')
        assert abs(float(l2) - 1.0) < 1e-6

    def test_logging(self, capsys):
        from pytorch_geometric_tpu.logging import init_wandb, log
        init_wandb('t')   # wandb absent -> silent no-op
        log(epoch=2, loss=0.25)
        out = capsys.readouterr().out
        assert 'loss: 0.2500' in out


def test_largest_cc_multiple_components():
    coo = np.array([[0, 1, 2, 3, 5, 6, 7], [1, 2, 3, 4, 6, 7, 5]])
    d = Data(x=np.ones((8, 2), np.float32), edge_index=coo)
    out = T.LargestConnectedComponents()(d)
    assert out.num_nodes == 5
    e = np.asarray(out.edge_index)
    assert e.shape[1] == 4 and e.max() < 5
