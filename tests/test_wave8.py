"""Advanced aggregations + backend/experimental flags tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.nn import aggr as A

rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((10, 6)).astype(np.float32))
IDX = jnp.asarray(np.sort(rng.integers(0, 3, 10)).astype(np.int32))


@pytest.mark.parametrize('mod,shape', [
    (A.SetTransformerAggregation(channels=16, heads=2), (3, 16)),
    (A.GraphMultisetTransformer(channels=16, heads=2), (3, 64)),
    (A.LCMAggregation(out_channels=8), (3, 8)),
    (A.PatchTransformerAggregation(channels=16, patch_size=4, heads=2),
     (3, 16)),
    (A.EquilibriumAggregation(out_channels=4, num_steps=5), (3, 4)),
], ids=lambda v: type(v).__name__ if not isinstance(v, tuple) else '')
def test_advanced_aggr_shapes(mod, shape):
    params = mod.init(jax.random.PRNGKey(0), X, IDX, 3)
    out = mod.apply(params, X, IDX, 3)
    assert out.shape == shape
    assert np.isfinite(np.asarray(out)).all()


def test_lcm_permutation_invariance_single_pair():
    """LCM with 2 elements: combine(a, b) order dependence is inherent
    to GRU combine; check determinism + masking instead."""
    mod = A.LCMAggregation(out_channels=8)
    params = mod.init(jax.random.PRNGKey(0), X, IDX, 3)
    o1 = mod.apply(params, X, IDX, 3)
    o2 = mod.apply(params, X, IDX, 3)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    mask = jnp.asarray(np.ones(10, bool)).at[0].set(False)
    o3 = mod.apply(params, X, IDX, 3, mask=mask)
    assert not np.allclose(np.asarray(o1)[0], np.asarray(o3)[0])


def test_equilibrium_grad_flows():
    mod = A.EquilibriumAggregation(out_channels=4, num_steps=3)
    params = mod.init(jax.random.PRNGKey(0), X, IDX, 3)

    def loss(x):
        return (mod.apply(params, x, IDX, 3) ** 2).sum()

    g = jax.grad(loss)(X)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_flags_and_gates():
    import pytorch_geometric_tpu as pgt
    assert isinstance(pgt.typing_flags.WITH_SCIPY, bool)
    assert pgt.backend.use_pallas_spmm is None
    from pytorch_geometric_tpu.experimental import (
        disable_dynamic_shapes, experimental_mode,
        is_experimental_mode_enabled, debug, is_debug_enabled)

    @disable_dynamic_shapes(['dim_size'])
    def f(x, dim_size=None):
        return x

    with pytest.raises(ValueError, match='static'):
        f(1)
    assert f(1, dim_size=4) == 1

    with experimental_mode('foo'):
        assert is_experimental_mode_enabled('foo')
    assert not is_experimental_mode_enabled('foo')
    with debug():
        assert is_debug_enabled()
    assert not is_debug_enabled()


def test_profiler():
    from pytorch_geometric_tpu.profile import Profiler
    from pytorch_geometric_tpu.nn.models import GCN
    x = X[:, :6]
    coo = jnp.asarray(np.stack([rng.integers(0, 10, 20),
                                rng.integers(0, 10, 20)]).astype(
                                    np.int32))
    model = GCN(hidden_channels=8, num_layers=2, out_channels=3)
    params = model.init(jax.random.PRNGKey(0), x, coo)
    rows = Profiler(model).profile(params, x, coo)
    mods = {r['module'] for r in rows}
    assert any('conv_0' in m for m in mods)
    assert any('conv_1' in m for m in mods)
    out = Profiler.format(rows)
    assert 'Output shape' in out


def test_list_and_dense_loaders():
    from pytorch_geometric_tpu.loader import (DataListLoader,
                                              DenseDataLoader)
    from pytorch_geometric_tpu.datasets import FakeDataset
    ds = FakeDataset(num_graphs=6, avg_num_nodes=20, avg_degree=3,
                     num_channels=4, task='graph', seed=0)
    b = next(iter(DataListLoader(ds, batch_size=3)))
    assert isinstance(b, list) and len(b) == 3

    # dense loader needs same-size graphs: use dense tensors directly
    class Dense:
        def __init__(self):
            from pytorch_geometric_tpu.data import Data
            self.graphs = [Data(x=np.ones((5, 3), np.float32),
                                adj=np.eye(5, dtype=np.float32),
                                y=np.array([i]), num_nodes=5)
                           for i in range(4)]

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return self.graphs[i]

    b = next(iter(DenseDataLoader(Dense(), batch_size=2)))
    assert b.x.shape == (2, 5, 3)
    assert b.adj.shape == (2, 5, 5)


def test_data_summary():
    from pytorch_geometric_tpu.data import summary
    from pytorch_geometric_tpu.datasets import FakeDataset
    ds = FakeDataset(num_graphs=5, avg_num_nodes=20, avg_degree=3,
                     num_channels=4, task='graph', seed=0)
    s = summary(ds)
    assert s.num_graphs == 5
    assert s.num_nodes.mean > 0
    assert 'Summary' in repr(s)
