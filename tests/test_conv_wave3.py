"""Conv wave 3 + attention package + unpool/encoding/Sequential tests."""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_geometric_tpu.nn as pgnn
from pytorch_geometric_tpu.nn.attention import (PerformerAttention,
                                                SGFormerAttention,
                                                PolynormerAttention,
                                                QFormer)
from pytorch_geometric_tpu.nn.models.mlp import MLP

rng = np.random.default_rng(0)
N, E, F = 14, 48, 8
X = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
COO = jnp.asarray(np.stack([rng.integers(0, N, E),
                            rng.integers(0, N, E)]).astype(np.int32))
ETYPE = jnp.asarray(rng.integers(0, 3, E).astype(np.int32))
EATTR = jnp.asarray(rng.random((E, 2)).astype(np.float32))


def run(mod, *args, **kw):
    params = mod.init(jax.random.PRNGKey(0), *args, **kw)
    return mod.apply(params, *args, **kw)


def test_gps_conv():
    mod = pgnn.GPSConv(channels=F,
                       conv=pgnn.SAGEConv(out_channels=F), heads=2)
    out = run(mod, X, COO)
    assert out.shape == (N, F)
    mod = pgnn.GPSConv(channels=F, conv=None, heads=2,
                       attn_type='performer')
    out = run(mod, X, COO)
    assert out.shape == (N, F)


def test_rgat_supergat_heat():
    out = run(pgnn.RGATConv(out_channels=6, num_relations=3, heads=2),
              X, COO, ETYPE)
    assert out.shape == (N, 12)
    out = run(pgnn.SuperGATConv(out_channels=6, heads=2), X, COO)
    assert out.shape == (N, 12)
    ntype = jnp.asarray(rng.integers(0, 2, N).astype(np.int32))
    out = run(pgnn.HEATConv(out_channels=6, num_node_types=2,
                            num_edge_types=3, heads=2),
              X, COO, ntype, ETYPE, EATTR)
    assert out.shape == (N, 12)


def test_kernel_convs():
    out = run(pgnn.GMMConv(out_channels=6, dim=2, kernel_size=3), X,
              COO, EATTR)
    assert out.shape == (N, 6)
    out = run(pgnn.SplineConv(out_channels=6, dim=2, kernel_size=3), X,
              COO, EATTR)
    assert out.shape == (N, 6)
    out = run(pgnn.NNConv(out_channels=6,
                          nn=MLP(channel_list=[F * 6])), X, COO, EATTR)
    assert out.shape == (N, 6)
    out = run(pgnn.CGConv(channels=F, dim=2), X, COO, EATTR)
    assert out.shape == (N, F)
    out = run(pgnn.FeaStConv(out_channels=6, heads=3), X, COO)
    assert out.shape == (N, 6)


def test_spline_basis_partition_of_unity():
    from pytorch_geometric_tpu.nn.conv.kernel_conv import _bspline_basis
    pseudo = jnp.asarray(rng.random((10, 2)).astype(np.float32))
    w, idx = _bspline_basis(pseudo, 4)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
    assert int(idx.max()) <= 3


def test_attention_modules():
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    mask = jnp.asarray(np.array([[1] * 10, [1] * 6 + [0] * 4], bool))
    for mod in (PerformerAttention(channels=16, heads=2),
                SGFormerAttention(channels=16, heads=2),
                PolynormerAttention(channels=16, heads=2)):
        out = run(mod, x, mask=mask.astype(x.dtype)
                  if isinstance(mod, PerformerAttention) else mask)
        assert out.shape == (2, 10, 16)
        assert np.isfinite(np.asarray(out)).all()
    out = run(QFormer(hidden_channels=16, num_queries=4, heads=2), x,
              mask=mask)
    assert out.shape == (2, 4, 16)


def test_knn_interpolate():
    from pytorch_geometric_tpu.nn import knn_interpolate
    pos_x = jnp.asarray(rng.standard_normal((20, 3)).astype(np.float32))
    pos_y = pos_x[:5] + 1e-4  # near-coincident points
    x = jnp.asarray(rng.standard_normal((20, 6)).astype(np.float32))
    out = knn_interpolate(x, pos_x, pos_y, k=3)
    assert out.shape == (5, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[:5]),
                               atol=0.05)


def test_encodings():
    from pytorch_geometric_tpu.nn import (PositionalEncoding,
                                          TemporalEncoding)
    t = jnp.asarray(np.arange(5, dtype=np.float32))
    out = run(PositionalEncoding(out_channels=8), t)
    assert out.shape == (5, 8)
    out = run(TemporalEncoding(out_channels=8), t)
    assert out.shape == (5, 8)


def test_sequential():
    from pytorch_geometric_tpu.nn import Sequential
    mod = Sequential(input_args='x, edge_index', modules=(
        (pgnn.GCNConv(out_channels=16), 'x, edge_index -> x'),
        fnn.relu,
        (pgnn.GCNConv(out_channels=4), 'x, edge_index -> x'),
    ))
    out = run(mod, X, COO)
    assert out.shape == (N, 4)
