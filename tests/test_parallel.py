"""Multi-chip partition-parallel tests (8-device virtual CPU mesh).

Asserts the invariant that partition-parallel full-batch GCN training is
numerically equivalent to the single-device model (the reference's
global-consistency test style, test/distributed/).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from pytorch_geometric_tpu.data import Data
from pytorch_geometric_tpu.parallel import (Partitioner,
                                            gcn_norm_weights,
                                            init_gcn_params,
                                            train_partition_parallel,
                                            shard_partitions,
                                            partition_gcn_apply,
                                            make_partition_gcn_step)

rng = np.random.default_rng(0)


def make_graph(n=64, e=256, f=8, classes=3):
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    return Data(x=rng.standard_normal((n, f)).astype(np.float32),
                edge_index=coo, y=rng.integers(0, classes, n),
                num_nodes=n)


def _single_device_loss(params, data, coo, w):
    """Reference loss computed without any mesh."""
    n = data.num_nodes
    x = jnp.asarray(np.asarray(data.x))
    y = jnp.asarray(np.asarray(data.y))
    src = jnp.asarray(coo[0])
    dst = jnp.asarray(coo[1])
    wj = jnp.asarray(w)

    def spmm(h):
        return jax.ops.segment_sum(h[src] * wj[:, None], dst, n)

    h = jax.nn.relu(spmm(x @ params['w1']) + params['b1'])
    logits = spmm(h @ params['w2']) + params['b2']
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    return losses.mean()


def test_partition_books():
    data = make_graph()
    parts = Partitioner(data, 4).generate_partition()
    assert parts.own_mask.sum() == 64
    # every node appears exactly once across parts
    owned = parts.own[parts.own_mask]
    assert len(np.unique(owned)) == 64
    # every real edge lands in its destination's partition
    coo = np.asarray(data.edge_index)
    assert parts.edge_mask.sum() == coo.shape[1]
    # global_pos is consistent with own layout
    for p in range(4):
        for i in range(parts.n_max):
            if parts.own_mask[p, i]:
                v = parts.own[p, i]
                assert parts.global_pos[v] == p * parts.n_max + i


def test_partition_parallel_matches_single_device():
    data = make_graph()
    n = data.num_nodes
    coo = np.asarray(data.edge_index)
    coo_sl = np.concatenate(
        [coo, np.stack([np.arange(n), np.arange(n)])], 1).astype(np.int64)
    w = gcn_norm_weights(coo_sl, n)

    params = init_gcn_params(jax.random.PRNGKey(0), 8, 16, 3)

    # partition-parallel loss over an 8-device mesh
    d2 = data.replace(edge_index=coo_sl.astype(np.int32), edge_weight=w)
    parts = Partitioner(d2, 8).generate_partition()
    mesh = Mesh(np.array(jax.devices('cpu')[:8]), ('graph',))
    shard = shard_partitions(mesh, parts, np.ones(n, bool))

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def loss_fn(params, *leaves):
        def body(params, *ls):
            s, c = partition_gcn_apply(params, ls)
            return (jax.lax.psum(s, 'graph'),
                    jax.lax.psum(c, 'graph'))
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(),) + tuple(P('graph')
                                               for _ in leaves),
                       out_specs=(P(), P()))
        s, c = fn(params, *leaves)
        return s / c

    with mesh:
        par_loss = float(loss_fn(params, *shard))
    ref_loss = float(_single_device_loss(params, data, coo_sl, w))
    np.testing.assert_allclose(par_loss, ref_loss, rtol=1e-5)


def test_sparse_halo_moves_fewer_bytes():
    """The sparse exchange ships O(boundary * F); the dense all_gather
    baseline ships O(P * N * F)."""
    data = make_graph(n=256, e=1024)
    parts = Partitioner(data, 8).generate_partition()
    F = 8
    assert parts.halo_send is not None
    assert parts.halo_bytes(F) < parts.gather_bytes(F)
    # boundary count can never exceed the number of (unique) cut edges
    coo = np.asarray(data.edge_index)
    cut = parts.node_part[coo[0]] != parts.node_part[coo[1]]
    assert parts.halo_send_mask.sum() <= cut.sum()


def test_partition_parallel_grad_parity():
    """Backward through the all_to_all equals the single-device grads
    (the mirrored halo-gradient exchange)."""
    data = make_graph()
    n = data.num_nodes
    coo = np.asarray(data.edge_index)
    coo_sl = np.concatenate(
        [coo, np.stack([np.arange(n), np.arange(n)])], 1).astype(np.int64)
    w = gcn_norm_weights(coo_sl, n)
    params = init_gcn_params(jax.random.PRNGKey(1), 8, 16, 3)
    d2 = data.replace(edge_index=coo_sl.astype(np.int32), edge_weight=w)
    parts = Partitioner(d2, 8).generate_partition()
    mesh = Mesh(np.array(jax.devices('cpu')[:8]), ('graph',))
    shard = shard_partitions(mesh, parts, np.ones(n, bool))

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def loss_fn(params, *leaves):
        def body(params, *ls):
            s, c = partition_gcn_apply(params, ls)
            return (jax.lax.psum(s, 'graph'), jax.lax.psum(c, 'graph'))
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(),) + tuple(P('graph')
                                               for _ in leaves),
                       out_specs=(P(), P()))
        s, c = fn(params, *leaves)
        return s / c

    with mesh:
        g_par = jax.grad(loss_fn)(params, *shard)
    g_ref = jax.grad(_single_device_loss)(params, data, coo_sl, w)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_par[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=1e-6)


def test_train_partition_parallel_learns():
    data = make_graph(n=96, e=500)
    mesh = Mesh(np.array(jax.devices('cpu')[:8]), ('graph',))
    params, losses = train_partition_parallel(
        data, num_parts=8, hidden=32, num_steps=80, lr=5e-2, mesh=mesh)
    assert losses[-1] < losses[0] * 0.7, losses


def test_partition_parallel_bsr_matches_single_device(monkeypatch):
    """Local dense-block edges through the BSR MXU kernel + halo tail:
    same loss and grads as the single-device model."""
    monkeypatch.setenv('PGT_BSR_MIN_FILL', '1')  # capture all local edges
    data = make_graph(n=160, e=900)
    n = data.num_nodes
    coo = np.asarray(data.edge_index)
    coo_sl = np.concatenate(
        [coo, np.stack([np.arange(n), np.arange(n)])], 1).astype(np.int64)
    w = gcn_norm_weights(coo_sl, n)
    params = init_gcn_params(jax.random.PRNGKey(2), 8, 16, 3)
    d2 = data.replace(edge_index=coo_sl.astype(np.int32), edge_weight=w)
    parts = Partitioner(d2, 8).generate_partition(local_bsr=True)
    assert parts.bsr_vals is not None
    # every local edge was captured: the edge list holds only cut edges
    cut = parts.node_part[coo_sl[0]] != parts.node_part[coo_sl[1]]
    assert parts.edge_mask.sum() == cut.sum()
    mesh = Mesh(np.array(jax.devices('cpu')[:8]), ('graph',))
    shard = shard_partitions(mesh, parts, np.ones(n, bool))
    assert len(shard) == 18

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def loss_fn(params, *leaves):
        def body(params, *ls):
            s, c = partition_gcn_apply(params, ls)
            return (jax.lax.psum(s, 'graph'), jax.lax.psum(c, 'graph'))
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(),) + tuple(P('graph')
                                               for _ in leaves),
                       out_specs=(P(), P()), check_vma=False)
        s, c = fn(params, *leaves)
        return s / c

    with mesh:
        par_loss = float(loss_fn(params, *shard))
        g_par = jax.grad(loss_fn)(params, *shard)
    ref_loss = float(_single_device_loss(params, data, coo_sl, w))
    np.testing.assert_allclose(par_loss, ref_loss, rtol=1e-5)
    g_ref = jax.grad(_single_device_loss)(params, data, coo_sl, w)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_par[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=1e-6)
