"""Second model wave: SchNet, AttentiveFP, DimeNet++, Signed, RECT,
GroupAddRev, TGN."""
import jax
import jax.numpy as jnp
import numpy as np

import pytorch_geometric_tpu.nn.models as M
from pytorch_geometric_tpu.nn import GraphConv

rng = np.random.default_rng(0)


def test_schnet():
    n = 12
    z = jnp.asarray(rng.integers(1, 10, n).astype(np.int32))
    pos = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 2)
    model = M.SchNet(hidden_channels=32, num_filters=32,
                     num_interactions=2, num_gaussians=10,
                     max_num_neighbors=6)
    params = model.init(jax.random.PRNGKey(0), z, pos)
    out = model.apply(params, z, pos)
    assert out.shape == (1, 1)
    assert np.isfinite(float(out[0, 0]))


def test_attentive_fp():
    n, e = 10, 30
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    coo = jnp.asarray(np.stack([rng.integers(0, n, e),
                                rng.integers(0, n, e)]).astype(np.int32))
    ea = jnp.asarray(rng.standard_normal((e, 4)).astype(np.float32))
    model = M.AttentiveFP(in_channels=8, hidden_channels=16,
                          out_channels=2, edge_dim=4, num_layers=2,
                          num_timesteps=2)
    params = model.init(jax.random.PRNGKey(0), x, coo, ea)
    out = model.apply(params, x, coo, ea)
    assert out.shape == (1, 2)


def test_dimenet_pp():
    n = 8
    z = jnp.asarray(rng.integers(1, 10, n).astype(np.int32))
    pos = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    coo = np.stack([rng.integers(0, n, 20),
                    rng.integers(0, n, 20)]).astype(np.int64)
    kj, ji, mask = M.DimeNetPlusPlus.triplets(coo, n, max_triplets=64)
    model = M.DimeNetPlusPlus(hidden_channels=16, out_channels=1,
                              num_blocks=2)
    params = model.init(jax.random.PRNGKey(0), z, pos,
                        jnp.asarray(coo), jnp.asarray(kj),
                        jnp.asarray(ji), jnp.asarray(mask))
    out = model.apply(params, z, pos, jnp.asarray(coo), jnp.asarray(kj),
                      jnp.asarray(ji), jnp.asarray(mask))
    # reference dimenet.py:724: batch=None -> P.sum(dim=0), [out_channels]
    assert out.shape == (1,)
    assert np.isfinite(float(out[0]))


def test_signed_gcn_and_rect():
    n = 12
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    pos_e = jnp.asarray(np.stack([rng.integers(0, n, 20),
                                  rng.integers(0, n, 20)]).astype(
                                      np.int32))
    neg_e = jnp.asarray(np.stack([rng.integers(0, n, 15),
                                  rng.integers(0, n, 15)]).astype(
                                      np.int32))
    model = M.SignedGCN(in_channels=8, hidden_channels=16, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), x, pos_e, neg_e)
    z = model.apply(params, x, pos_e, neg_e)
    assert z.shape == (n, 32)
    l1 = M.SignedGCN.pos_embedding_loss(z, pos_e)
    l2 = M.SignedGCN.neg_embedding_loss(z, neg_e)
    assert np.isfinite(l1) and np.isfinite(l2)

    model = M.RECT_L(in_channels=8, hidden_channels=16)
    params = model.init(jax.random.PRNGKey(0), x, pos_e)
    out = model.apply(params, x, pos_e)
    assert out.shape == (n, 8)
    y = rng.integers(0, 3, n)
    mask = rng.random(n) < 0.6
    sem = M.RECT_L.get_semantic_labels(np.asarray(x), y, mask)
    assert sem.shape == (mask.sum(), 8)


def test_group_add_rev():
    n = 10
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    coo = jnp.asarray(np.stack([rng.integers(0, n, 30),
                                rng.integers(0, n, 30)]).astype(np.int32))
    model = M.GroupAddRev(conv=GraphConv(out_channels=8), num_groups=2)
    params = model.init(jax.random.PRNGKey(0), x, coo)
    out = model.apply(params, x, coo)
    assert out.shape == (n, 16)


def test_temporal_data_and_tgn():
    ne, nn_, md = 60, 15, 4
    td = M.TemporalData(
        src=rng.integers(0, nn_, ne), dst=rng.integers(0, nn_, ne),
        t=np.sort(rng.random(ne).astype(np.float32) * 100),
        msg=rng.standard_normal((ne, md)).astype(np.float32))
    tr, va, te = td.train_val_test_split(0.2, 0.2)
    assert tr.num_events + va.num_events + te.num_events == ne

    mem = M.TGNMemory(num_nodes=nn_, raw_msg_dim=md, memory_dim=8,
                      time_dim=8)
    state = mem.init_state()
    b = next(td.seq_batches(20))
    params = mem.init(jax.random.PRNGKey(0), state,
                      jnp.asarray(b.src), jnp.asarray(b.dst),
                      jnp.asarray(b.t), jnp.asarray(b.msg))

    @jax.jit
    def step(state, src, dst, t, msg):
        return mem.apply(params, state, src, dst, t, msg)

    for batch in td.seq_batches(20):
        state, (zs, zd) = step(state, jnp.asarray(batch.src),
                               jnp.asarray(batch.dst),
                               jnp.asarray(batch.t),
                               jnp.asarray(batch.msg))
    assert zs.shape == (20, 8)
    # memory of touched nodes changed
    touched = np.unique(np.concatenate([td.src, td.dst]))
    assert np.abs(np.asarray(state.memory)[touched]).sum() > 0
    assert float(state.last_update.max()) > 0

    lnl = M.LastNeighborLoader(nn_, size=3)
    lnl.insert(td.src[:20], td.dst[:20])
    n_id, ei, eid, mask = lnl(np.arange(5))
    assert ei.shape[1] == 5 * 3
    assert mask.shape == (15,)
