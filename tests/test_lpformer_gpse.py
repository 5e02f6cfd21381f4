"""Behavioral coverage for LPFormer (static-context TPU redesign; the
reference builds ragged per-pair node sets at runtime, so there is no
bit-exact oracle) and the AddGPSE / precompute_gpse pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

rng = np.random.default_rng(5)


def _two_block_graph(n=40, p_in=0.5, p_out=0.02):
    """Two dense communities; positive links are intra-community."""
    edges = []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            same = (i < n // 2) == (j < n // 2)
            if rng.random() < (p_in if same else p_out):
                edges.append((i, j))
    coo = np.asarray(edges, np.int64).T
    return coo


def test_lpformer_learns_link_prediction():
    from pytorch_geometric_tpu.nn.models import (LPFormer,
                                                 build_link_context)
    from pytorch_geometric_tpu.utils.extra import ppr

    n = 40
    coo = _two_block_graph(n)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    (r, c), v = ppr(coo, n, alpha=0.15)
    P = np.zeros((n, n), np.float32)
    P[r, c] = v

    # positive = same community, negative = cross community
    pos = np.stack([rng.integers(0, n // 2, 32),
                    rng.integers(0, n // 2, 32)])
    neg = np.stack([rng.integers(0, n // 2, 32),
                    rng.integers(n // 2, n, 32)])
    pairs = np.concatenate([pos, neg], 1)
    labels = jnp.asarray(np.concatenate([np.ones(32), np.zeros(32)])
                         .astype(np.float32))
    ctx = build_link_context(coo, n, pairs, P, k_cn=8, k_onehop=8,
                             k_non1hop=4)
    ctx = tuple(jnp.asarray(c) for c in ctx)
    pairs_j = jnp.asarray(pairs)
    ei = jnp.asarray(coo.astype(np.int32))

    model = LPFormer(in_channels=8, hidden_channels=32)
    params = model.init(jax.random.PRNGKey(0), pairs_j, x, ei, *ctx)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            logit = model.apply(p, pairs_j, x, ei, *ctx)
            return optax.sigmoid_binary_cross_entropy(logit,
                                                      labels).mean()
        l, g = jax.value_and_grad(lf)(params)
        up, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, up), opt2, l

    l0 = None
    for _ in range(150):
        params, opt, l = step(params, opt)
        l0 = l0 if l0 is not None else float(l)
    assert float(l) < 0.5 * l0
    # the learned scorer must rank intra-community pairs above cross ones
    logit = np.asarray(model.apply(params, pairs_j, x, ei, *ctx))
    auc_pairs = (logit[:32][:, None] > logit[32:][None, :]).mean()
    assert auc_pairs > 0.85


def test_link_context_structure():
    from pytorch_geometric_tpu.nn.models import build_link_context
    from pytorch_geometric_tpu.utils.extra import ppr
    # tiny hand graph: 0-1 share neighbor 2; 3 is 1-hop of 0 only
    coo = np.asarray([[0, 2, 1, 2, 0, 3],
                      [2, 0, 2, 1, 3, 0]], np.int64)
    (r, c), v = ppr(coo, 4, alpha=0.15)
    P = np.zeros((4, 4), np.float32)
    P[r, c] = v
    idx, typ, sp, tp, mask = build_link_context(
        coo, 4, np.asarray([[0], [1]]), P, k_cn=2, k_onehop=2,
        k_non1hop=0)
    # node 2 is the single common neighbor, node 3 the single 1-hop
    assert idx[0, 0] == 2 and typ[0, 0] == 0 and mask[0, 0]
    onehop = idx[0, 2:][mask[0, 2:]]
    assert list(onehop) == [3]
    assert (typ[0, 2:][mask[0, 2:]] == 1).all()


def test_add_gpse_transform():
    from pytorch_geometric_tpu.nn.models import GPSE, AddGPSE
    from pytorch_geometric_tpu.data import Data
    n = 12
    coo = np.stack([rng.integers(0, n, 30), rng.integers(0, n, 30)])
    model = GPSE(dim_in=8, dim_hidden=16, dim_out=6, num_layers=2)
    x0 = jnp.zeros((n, 8))
    params = model.init(jax.random.PRNGKey(0), x0,
                        jnp.asarray(coo.astype(np.int32)))
    data = Data(x=jnp.asarray(rng.standard_normal((n, 3)).astype(
        np.float32)), edge_index=jnp.asarray(coo.astype(np.int32)),
        num_nodes=n)
    out = AddGPSE(model, params)(data)
    pe = np.asarray(out.pestat_GPSE)
    assert pe.shape == (n, 6)
    assert np.isfinite(pe).all()
    # final_l2_norm: rows are unit-norm
    np.testing.assert_allclose(np.linalg.norm(pe, axis=1), 1.0,
                               rtol=1e-4)
