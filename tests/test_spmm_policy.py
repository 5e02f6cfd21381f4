"""Automatic SpMM dispatch policy (VERDICT r3 #1).

`EdgeIndex.fill_cache(auto=True)` + the `spmm_regime` introspection
ladder must pick each regime on representative graphs without any
manual mode selection — the TPU analog of the reference's silent
dispatch at ``torch_geometric/edge_index.py:1925``:

    dense <= HBM cap -> BSR when block fill clears threshold after
    hubs-first reorder -> chunked past the gather-bytes trigger ->
    gather otherwise.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_geometric_tpu import EdgeIndex
from pytorch_geometric_tpu.ops import spmm, spmm_regime
import importlib
_spmm_mod = importlib.import_module('pytorch_geometric_tpu.ops.spmm')

rng = np.random.default_rng(7)


def _clustered_coo(n_blocks=24, bs=128, pairs=3, epp=2000):
    """Block-dense graph: `pairs` random src-block partners per dst
    block, `epp` edges each -> ~16 edges per 128x128 block."""
    rows, cols = [], []
    for db in range(n_blocks):
        for sb in rng.integers(0, n_blocks, pairs):
            rows.append(rng.integers(sb * bs, (sb + 1) * bs, epp))
            cols.append(rng.integers(db * bs, (db + 1) * bs, epp))
    return np.stack([np.concatenate(rows),
                     np.concatenate(cols)]).astype(np.int32)


@pytest.fixture()
def tpu_decisions(monkeypatch):
    """Emulate the TPU-side policy on the CPU test backend."""
    monkeypatch.setenv('PGT_FORCE_DENSE_SPMM', '1')
    yield


def test_auto_small_graph_picks_dense(tpu_decisions):
    coo = rng.integers(0, 500, (2, 4000)).astype(np.int32)
    ei = EdgeIndex(coo, (500, 500)).fill_cache(auto=True)
    assert spmm_regime(ei) == 'dense-cached'
    # cached weights are unit: matches the plain gather reference
    x = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    ref = spmm(EdgeIndex(coo, (500, 500)), x)
    assert jnp.allclose(spmm(ei, x), ref, atol=5e-2, rtol=5e-2)


def test_auto_big_clustered_graph_picks_bsr(tpu_decisions, monkeypatch):
    # dense cap squeezed below N^2 -> policy must fall to block-sparse
    monkeypatch.setenv('PGT_DENSE_SPMM_ENTRIES', '100000')
    coo = _clustered_coo()
    n = 24 * 128
    ei = EdgeIndex(coo, (n, n)).fill_cache(auto=True)
    assert spmm_regime(ei) == 'bsr'


def test_auto_scattered_graph_falls_past_bsr(tpu_decisions, monkeypatch):
    """Uniformly scattered sparse graph (~7 edges per 128x128 block,
    under PGT_BSR_MIN_FILL): block fill stays under threshold even after
    the hubs-first reorder -> no baked cache; the runtime ladder then
    lands on chunked (big gathered bytes) or gather."""
    monkeypatch.setenv('PGT_DENSE_SPMM_ENTRIES', '100000')
    n = 24 * 128
    coo = rng.integers(0, n, (2, 4000)).astype(np.int32)
    ei = EdgeIndex(coo, (n, n)).fill_cache(auto=True)
    assert ei.dense_adj is None and ei.bsr is None
    assert spmm_regime(ei, num_feats=64) in ('gather-sorted', 'pallas')
    # past the gathered-bytes trigger the same graph goes chunked
    monkeypatch.setattr(_spmm_mod, '_CHUNK_TRIGGER_BYTES',
                        coo.shape[1] * 64 * 4 - 1)
    assert spmm_regime(ei, num_feats=64) == 'chunked'


def test_auto_on_cpu_backend_stays_sparse():
    """Without the TPU emulation flag, auto on the CPU backend must NOT
    bake an O(N^2 F)-FLOP dense cache."""
    coo = rng.integers(0, 300, (2, 2000)).astype(np.int32)
    ei = EdgeIndex(coo, (300, 300)).fill_cache(auto=True)
    assert ei.dense_adj is None
    assert spmm_regime(ei) in ('gather-sorted', 'pallas')


def test_auto_on_cpu_carries_weights_not_bakes():
    """cache_gcn_norm(auto=True) on the CPU backend must stay sparse
    AND mathematically identical — weights are carried on the
    EdgeIndex for the sparse regimes (r4 review fix)."""
    from pytorch_geometric_tpu.nn import cache_gcn_norm
    coo = rng.integers(0, 120, (2, 900)).astype(np.int32)
    ei = cache_gcn_norm(EdgeIndex(coo, (120, 120)), auto=True)
    assert ei.dense_adj is None and ei.bsr is None
    assert ei.weight is not None
    x = jnp.asarray(rng.standard_normal((120, 8)).astype(np.float32))
    # reference: the same norm applied explicitly on the sparse path
    ref_ei = cache_gcn_norm(EdgeIndex(coo, (120, 120)))  # non-auto CPU
    out = spmm(ei, x)
    # uncached GCN norm math via gcn_norm weights
    from pytorch_geometric_tpu.nn import gcn_norm
    nei, w = gcn_norm(EdgeIndex(coo, (120, 120)), None, 120, False,
                      True)
    ref = spmm(nei, x, edge_weight=w)
    assert jnp.allclose(out, ref, atol=1e-4), (
        float(jnp.abs(out - ref).max()))


def test_explicit_edge_weight_overrides_carried():
    coo = rng.integers(0, 60, (2, 300)).astype(np.int32)
    w_carried = np.full(300, 2.0, np.float32)
    ei = EdgeIndex(coo, (60, 60), weight=jnp.asarray(w_carried))
    x = jnp.asarray(rng.standard_normal((60, 4)).astype(np.float32))
    w_explicit = jnp.ones(300)
    out = spmm(ei, x, edge_weight=w_explicit)
    ref = spmm(EdgeIndex(coo, (60, 60)), x, edge_weight=w_explicit)
    assert jnp.allclose(out, ref, atol=1e-5)
    # and carried weights engage when none passed
    out2 = spmm(ei, x)
    ref2 = spmm(EdgeIndex(coo, (60, 60)), x,
                edge_weight=jnp.asarray(w_carried))
    assert jnp.allclose(out2, ref2, atol=1e-5)


def test_auto_respects_explicit_weights_and_dtype(tpu_decisions):
    coo = rng.integers(0, 200, (2, 1500)).astype(np.int32)
    w = rng.standard_normal(1500).astype(np.float32)
    ei = EdgeIndex(coo, (200, 200)).fill_cache(
        auto=True, dense_weight=w, cache_dtype=jnp.float32)
    assert ei.dense_adj is not None and ei.dense_adj.dtype == jnp.float32
    x = jnp.asarray(rng.standard_normal((200, 8)).astype(np.float32))
    ref = spmm(EdgeIndex(coo, (200, 200)), x, edge_weight=jnp.asarray(w))
    assert jnp.allclose(spmm(ei, x), ref, atol=1e-4)
