"""GraphGym stage/head options (reference ``graphgym/models/gnn.py``
GNNStackStage variants + ``models/head.py`` task heads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_geometric_tpu.graphgym import set_cfg
from pytorch_geometric_tpu.graphgym.model_builder import create_model

N, E, F, C = 40, 120, 16, 3
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
COO = jnp.asarray(rng.integers(0, N, (2, E)).astype(np.int32))


def _cfg(**gnn_over):
    c = set_cfg()
    c.dataset.num_classes = C
    c.gnn.dim_inner = 16
    for k, v in gnn_over.items():
        c.gnn[k] = v
    return c


@pytest.mark.parametrize('stage', ['stack', 'skipsum', 'skipconcat'])
def test_stage_types(stage):
    c = _cfg(stage_type=stage, layers_mp=3, layers_pre_mp=1,
             layers_post_mp=2)
    model = create_model(c)
    params = model.init(jax.random.PRNGKey(0), X, COO)
    out = model.apply(params, X, COO)
    assert out.shape == (N, C)
    assert np.isfinite(np.asarray(out)).all()


def test_batchnorm_l2norm():
    c = _cfg(batchnorm=True, l2norm=True)
    model = create_model(c)
    variables = model.init(jax.random.PRNGKey(0), X, COO)
    assert 'batch_stats' in variables
    out = model.apply(variables, X, COO)
    assert out.shape == (N, C)


def test_graph_head_pooling():
    c = _cfg()
    c.dataset.task = 'graph'
    c.model.graph_pooling = 'mean'
    model = create_model(c)
    batch = jnp.asarray((np.arange(N) % 4).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), X, COO, batch=batch,
                        num_graphs=4)
    out = model.apply(params, X, COO, batch=batch, num_graphs=4)
    assert out.shape == (4, C)


def test_skipconcat_trains():
    import optax
    c = _cfg(stage_type='skipconcat', layers_mp=2)
    model = create_model(c)
    y = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), X, COO)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, X, COO), y).mean()
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, loss

    l0 = None
    for i in range(30):
        params, opt, loss = step(params, opt)
        l0 = l0 if l0 is not None else float(loss)
    assert float(loss) < l0


def test_feature_encoders():
    from pytorch_geometric_tpu.graphgym import (AtomEncoder, BondEncoder,
                                                IntegerFeatureEncoder)
    from pytorch_geometric_tpu.graphgym.register import registry
    assert 'Atom' in registry['node_encoder']
    assert 'Bond' in registry['edge_encoder']
    xi = jnp.asarray(np.random.default_rng(0).integers(0, 9, (10, 9)))
    enc = AtomEncoder(emb_dim=16)
    p = enc.init(jax.random.PRNGKey(0), xi)
    assert enc.apply(p, xi).shape == (10, 16)
    ei = jnp.asarray(np.random.default_rng(1).integers(0, 2, (20, 3)))
    benc = BondEncoder(emb_dim=8)
    p = benc.init(jax.random.PRNGKey(0), ei)
    assert benc.apply(p, ei).shape == (20, 8)
    ienc = IntegerFeatureEncoder(emb_dim=4, num_classes=10)
    p = ienc.init(jax.random.PRNGKey(0), xi)
    assert ienc.apply(p, xi).shape == (10, 4)
