"""Parity wave 11 vs the reference PyG oracle: PositionalEncoding,
TemporalEncoding, the TGN TimeEncoder, and the full TGNMemory update
pipeline (identity message + last aggregation + GRU) over two event
batches."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn as pgnn
import pytorch_geometric_tpu.nn.models as pm
from pytorch_geometric_tpu.nn.encoding import TimeEncoder
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(11)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_positional_encoding():
    from torch_geometric.nn import PositionalEncoding
    x = rng.random(17).astype(np.float32) * 50
    for gran in (1.0, 0.1):
        ref = PositionalEncoding(8, granularity=gran)
        r = ref(t(x)).numpy()
        ours = pgnn.PositionalEncoding(out_channels=8, granularity=gran)
        g = ours(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


def test_temporal_encoding():
    from torch_geometric.nn import TemporalEncoding
    x = rng.random(17).astype(np.float32) * 50
    ref = TemporalEncoding(8)
    r = ref(t(x)).numpy()
    g = pgnn.TemporalEncoding(out_channels=8)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


def test_time_encoder():
    from torch_geometric.nn.models.tgn import TimeEncoder as TTime
    x = rng.random(9).astype(np.float32) * 10
    ref = TTime(6)
    ours = TimeEncoder(out_channels=6)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = transplant(ref, params)
    with torch.no_grad():
        r = ref(t(x)).numpy()
    g = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


def _gru_cell_overrides(name):
    """Map torch nn.GRUCell weights onto a flax GRUCell named ``name``."""
    def slcT(key, i):
        return lambda sd: np.split(sd[f'{name}.{key}'], 3, axis=0)[i].T

    def bias_rz(i):
        return lambda sd: (np.split(sd[f'{name}.bias_ih'], 3)[i]
                           + np.split(sd[f'{name}.bias_hh'], 3)[i])

    return {
        f'{name}.ir.kernel': slcT('weight_ih', 0),
        f'{name}.iz.kernel': slcT('weight_ih', 1),
        f'{name}.in.kernel': slcT('weight_ih', 2),
        f'{name}.hr.kernel': slcT('weight_hh', 0),
        f'{name}.hz.kernel': slcT('weight_hh', 1),
        f'{name}.hn.kernel': slcT('weight_hh', 2),
        f'{name}.ir.bias': bias_rz(0),
        f'{name}.iz.bias': bias_rz(1),
        f'{name}.in.bias': lambda sd: np.split(sd[f'{name}.bias_ih'], 3)[2],
        f'{name}.hn.bias': lambda sd: np.split(sd[f'{name}.bias_hh'], 3)[2],
    }


def test_tgn_memory():
    from torch_geometric.nn.models.tgn import (IdentityMessage,
                                               LastAggregator)
    from torch_geometric.nn.models import TGNMemory as TTGN
    N, RAW, D, T = 10, 5, 7, 6
    ref = TTGN(N, RAW, D, T, message_module=IdentityMessage(RAW, D, T),
               aggregator_module=LastAggregator())
    # Entering eval mode flushes empty messages through the GRU for ALL
    # nodes (reference tgn.py:181); re-zero so both sides start equal.
    ref.eval()
    ref.reset_state()

    # Two event batches; strictly increasing unique timestamps so the
    # last-message aggregation is unambiguous.
    src1 = np.array([0, 1, 2, 3]); dst1 = np.array([4, 5, 6, 7])
    t1 = np.array([1, 2, 3, 4])
    raw1 = rng.standard_normal((4, RAW)).astype(np.float32)
    src2 = np.array([2, 4, 8, 0]); dst2 = np.array([9, 1, 3, 5])
    t2 = np.array([5, 6, 7, 8])
    raw2 = rng.standard_normal((4, RAW)).astype(np.float32)

    with torch.no_grad():
        ref.update_state(t(src1), t(dst1), t(t1), t(raw1))
        ref.update_state(t(src2), t(dst2), t(t2), t(raw2))
        mem_ref, last_ref = ref(torch.arange(N))

    ours = pm.TGNMemory(num_nodes=N, raw_msg_dim=RAW, memory_dim=D,
                        time_dim=T)
    state = ours.init_state()
    ja = lambda a: jnp.asarray(a, jnp.int32)
    params = ours.init(jax.random.PRNGKey(0), state, ja(src1), ja(dst1),
                       jnp.asarray(t1, jnp.float32), jnp.asarray(raw1))
    params = transplant(ref, params, _gru_cell_overrides('gru'))
    state, _ = ours.apply(params, state, ja(src1), ja(dst1),
                          jnp.asarray(t1, jnp.float32), jnp.asarray(raw1))
    state, _ = ours.apply(params, state, ja(src2), ja(dst2),
                          jnp.asarray(t2, jnp.float32), jnp.asarray(raw2))
    np.testing.assert_allclose(np.asarray(state.memory), mem_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.last_update),
                               last_ref.numpy().astype(np.float32),
                               rtol=0, atol=0)


def test_last_neighbor_loader():
    """Behavioral oracle for LastNeighborLoader (reference tgn.py:228):
    after 3 event batches the set of (neighbor, center, e_id) triples
    returned for a query must match, including ring-buffer eviction."""
    from torch_geometric.nn.models.tgn import LastNeighborLoader as TLoader
    N, SIZE = 12, 3
    ref = TLoader(N, size=SIZE)
    ours = pm.LastNeighborLoader(N, size=SIZE)
    r2 = np.random.default_rng(7)
    offset = 0
    for _ in range(3):
        src = r2.integers(0, N, 10)
        dst = r2.integers(0, N, 10)
        ref.insert(t(src), t(dst))
        ours.insert(src, dst, e_id0=offset)
        offset += len(src)

    query = np.array([0, 3, 5, 7, 11])
    rn_id, redge, re_id = ref(t(query))
    triples_ref = {(int(rn_id[a]), int(rn_id[b]), int(e))
                   for a, b, e in zip(redge[0], redge[1], re_id)}

    n_id, edge, e_ids, mask = ours(query)
    triples_ours = set()
    for k in range(edge.shape[1]):
        if mask[k]:
            triples_ours.add((int(n_id[edge[0, k]]),
                              int(query[edge[1, k]]), int(e_ids[k])))
    assert triples_ours == triples_ref
