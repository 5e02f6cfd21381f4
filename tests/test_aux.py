"""Explain / profile / metrics / stores tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.data.stores import (InMemoryFeatureStore,
                                               InMemoryGraphStore,
                                               TensorAttr, EdgeLayout)
from pytorch_geometric_tpu.explain import (Explainer, GNNExplainer,
                                           DummyExplainer, Threshold,
                                           groundtruth_metrics, fidelity,
                                           characterization_score,
                                           unfaithfulness)
from pytorch_geometric_tpu.metrics import (LinkPredPrecision,
                                           LinkPredRecall, LinkPredMRR,
                                           LinkPredNDCG, LinkPredMAP,
                                           LinkPredHitRatio,
                                           LinkPredMetricCollection)
from pytorch_geometric_tpu.nn import GCNConv
from pytorch_geometric_tpu.profile import (timeit, profileit, benchmark,
                                           count_model_params,
                                           edges_per_second)

rng = np.random.default_rng(0)


def _setup_model():
    n, e, f, c = 20, 60, 8, 3
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    coo = jnp.asarray(np.stack([rng.integers(0, n, e),
                                rng.integers(0, n, e)]).astype(np.int32))
    model = GCNConv(out_channels=c)
    params = model.init(jax.random.PRNGKey(0), x, coo)

    def model_fn(h, edge_weight=None):
        return model.apply(params, h, coo, edge_weight=edge_weight)

    return model_fn, x, coo


def test_gnn_explainer():
    model_fn, x, coo = _setup_model()
    target = jnp.asarray(model_fn(x).argmax(-1))
    explainer = Explainer(model_fn, GNNExplainer(epochs=20))
    out = explainer(x, coo, target=target, index=3)
    assert out.edge_mask.shape == (coo.shape[1],)
    # facade default node_mask_type='attributes' -> [N, F] mask
    # (reference gnn_explainer.py:409)
    assert out.node_mask.shape == (x.shape[0], x.shape[1])
    m = np.asarray(out.edge_mask)
    assert ((m >= 0) & (m <= 1)).all()
    # thresholding
    th = out.threshold('topk_hard', 5)
    assert np.asarray(th.edge_mask).sum() == 5


def test_dummy_and_fidelity():
    model_fn, x, coo = _setup_model()
    target = jnp.asarray(model_fn(x).argmax(-1))
    out = DummyExplainer()(model_fn, x, coo, target)
    fp, fn_ = fidelity(model_fn, out)
    assert -1 <= fp <= 1 and -1 <= fn_ <= 1
    s = characterization_score(max(fp, 0.1), min(fn_, 0.9))
    assert 0 <= s <= 1
    u = unfaithfulness(model_fn, out)
    assert 0 <= u <= 1


def test_groundtruth_metrics():
    pred = np.array([0.9, 0.8, 0.2, 0.1])
    truth = np.array([1, 0, 1, 0])
    acc, rec, prec, f1, auroc = groundtruth_metrics(pred, truth)
    assert acc == 0.5 and 0 <= auroc <= 1


def test_link_pred_metrics():
    # 2 queries; truth: q0 -> {1, 2}, q1 -> {5}
    eli = np.array([[0, 0, 1], [1, 2, 5]])
    pred = np.array([[1, 3, 2], [4, 5, 6]])
    m = LinkPredPrecision(k=3)
    m.update(pred, eli)
    assert m.compute() == pytest.approx((2 / 3 + 1 / 3) / 2)
    m = LinkPredRecall(k=3)
    m.update(pred, eli)
    assert m.compute() == pytest.approx((1.0 + 1.0) / 2)
    m = LinkPredMRR(k=3)
    m.update(pred, eli)
    assert m.compute() == pytest.approx((1.0 + 0.5) / 2)
    m = LinkPredHitRatio(k=3)
    m.update(pred, eli)
    assert m.compute() == 1.0
    coll = LinkPredMetricCollection([LinkPredNDCG(k=3), LinkPredMAP(k=3)])
    coll.update(pred, eli)
    vals = coll.compute()
    assert all(0 <= v <= 1 for v in vals.values())


def test_profile_utils():
    @profileit()
    def f(a):
        return a * 2

    out, stats = f(jnp.ones((4,)))
    assert stats.time > 0
    with timeit(log=False) as t:
        jnp.ones((8, 8)).sum().block_until_ready()
    assert t.duration > 0
    rows = benchmark([lambda a: a + 1, lambda a: a * 2],
                     args=(jnp.ones((16,)),), num_steps=3,
                     func_names=['add', 'mul'])
    assert len(rows) == 2 and all(r['time'] > 0 for r in rows)
    assert count_model_params({'w': jnp.ones((3, 4)),
                               'b': jnp.ones((4,))}) == 16
    assert edges_per_second(100, 2.0) == 50


def test_feature_store():
    fs = InMemoryFeatureStore()
    x = rng.standard_normal((10, 4)).astype(np.float32)
    fs.put_tensor(x, group_name='paper', attr_name='x')
    got = fs.get_tensor('paper', 'x', index=np.array([1, 3]))
    np.testing.assert_allclose(got, x[[1, 3]])
    fs['paper', 'y'] = np.arange(10)
    assert len(fs.get_all_tensor_attrs()) == 2
    assert fs.remove_tensor('paper', 'x')
    with pytest.raises(KeyError):
        fs.get_tensor('paper', 'x')


def test_graph_store():
    gs = InMemoryGraphStore()
    row = np.array([0, 2, 1, 2])
    col = np.array([1, 0, 2, 1])
    gs.put_edge_index((row, col), edge_type='e', layout='coo')
    r, c = gs.coo('e')
    np.testing.assert_array_equal(r, row)
    colptr, rows_csc, perm = gs.csc('e')
    assert colptr[-1] == 4
    # csc sorted by destination
    assert (np.diff(np.asarray(col)[perm]) >= 0).all()


def test_export_stablehlo_roundtrip(tmp_path):
    """export_program/load_program: serialized GCN forward reproduces
    the live model's outputs (the TorchScript/ONNX deployment analog)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pytorch_geometric_tpu.export import export_program, load_program
    from pytorch_geometric_tpu.nn.models import GCN

    rng = np.random.default_rng(0)
    n, e, f, c = 40, 160, 8, 3
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    coo = jnp.asarray(rng.integers(0, n, (2, e)).astype(np.int32))
    model = GCN(hidden_channels=16, num_layers=2, out_channels=c)
    params = model.init(jax.random.PRNGKey(0), x, coo)

    def fwd(x, coo):
        return model.apply(params, x, coo)

    path = str(tmp_path / 'gcn.stablehlo')
    blob = export_program(fwd, [x, coo], path=path)
    assert len(blob) > 100
    served = load_program(path)
    np.testing.assert_allclose(np.asarray(served(x, coo)),
                               np.asarray(fwd(x, coo)), rtol=1e-6,
                               atol=1e-6)
