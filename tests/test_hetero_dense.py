"""HeteroData, hetero convs, dense subpackage tests."""
import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_tpu.data.hetero_data import HeteroData
from pytorch_geometric_tpu.nn import (HeteroConv, HGTConv, HANConv,
                                      SAGEConv, GraphConv)
from pytorch_geometric_tpu.nn.dense import (Linear, HeteroLinear,
                                            HeteroDictLinear, DenseGCNConv,
                                            DenseSAGEConv, DenseGINConv,
                                            DenseGraphConv, DenseGATConv,
                                            dense_diff_pool,
                                            dense_mincut_pool, DMoNPooling)
from pytorch_geometric_tpu.nn.models.mlp import MLP

rng = np.random.default_rng(0)


def make_hetero():
    data = HeteroData()
    data['paper'].x = rng.standard_normal((8, 16)).astype(np.float32)
    data['author'].x = rng.standard_normal((5, 8)).astype(np.float32)
    data['paper', 'cites', 'paper'].edge_index = np.stack(
        [rng.integers(0, 8, 20), rng.integers(0, 8, 20)]).astype(np.int32)
    data['author', 'writes', 'paper'].edge_index = np.stack(
        [rng.integers(0, 5, 15), rng.integers(0, 8, 15)]).astype(np.int32)
    return data


def test_hetero_data_container():
    data = make_hetero()
    assert data.node_types == ['paper', 'author']
    assert ('author', 'writes', 'paper') in data.edge_types
    assert data['paper'].num_nodes == 8
    assert data['author', 'writes', 'paper'].num_edges == 15
    nt, et = data.metadata()
    assert len(nt) == 2 and len(et) == 2
    # pytree round-trip
    leaves, treedef = jax.tree_util.tree_flatten(data)
    data2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(data2['paper'].x),
                                  np.asarray(data['paper'].x))
    homo = data.to_homogeneous(add_node_type=True)
    assert homo.num_nodes == 13
    assert homo.edge_index.shape[1] == 35


def test_hetero_conv():
    data = make_hetero()
    convs = {
        ('paper', 'cites', 'paper'): SAGEConv(out_channels=32),
        ('author', 'writes', 'paper'): SAGEConv(out_channels=32),
    }
    mod = HeteroConv(convs=convs, aggr='sum')
    x_dict = data.x_dict
    ei_dict = data.edge_index_dict
    params = mod.init(jax.random.PRNGKey(0), x_dict, ei_dict)
    out = mod.apply(params, x_dict, ei_dict)
    assert out['paper'].shape == (8, 32)
    assert 'author' not in out  # no edges point at author


def test_hgt_conv():
    data = make_hetero()
    mod = HGTConv(out_channels=32,
                  metadata=(tuple(data.metadata()[0]),
                            tuple(data.metadata()[1])), heads=4)
    params = mod.init(jax.random.PRNGKey(0), data.x_dict,
                      data.edge_index_dict)
    out = mod.apply(params, data.x_dict, data.edge_index_dict)
    assert out['paper'].shape == (8, 32)
    assert np.isfinite(np.asarray(out['paper'])).all()


def test_han_conv():
    data = make_hetero()
    mod = HANConv(out_channels=32, metadata=(tuple(data.metadata()[0]),
                                             tuple(data.metadata()[1])),
                  heads=4)
    params = mod.init(jax.random.PRNGKey(0), data.x_dict,
                      data.edge_index_dict)
    out = mod.apply(params, data.x_dict, data.edge_index_dict)
    assert out['paper'].shape == (8, 32)
    assert out['author'] is None


def test_hetero_linear():
    x = jnp.asarray(rng.standard_normal((10, 6)).astype(np.float32))
    tv = jnp.asarray(rng.integers(0, 3, 10).astype(np.int32))
    mod = HeteroLinear(out_channels=4, num_types=3)
    params = mod.init(jax.random.PRNGKey(0), x, tv)
    out = mod.apply(params, x, tv)
    assert out.shape == (10, 4)
    # type-wise equals plain matmul with that type's weight
    w = params['params']['weight']
    b = params['params']['bias']
    ref = np.stack([np.asarray(x[i] @ w[int(tv[i])] + b[int(tv[i])])
                    for i in range(10)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    mod = HeteroDictLinear(out_channels=4)
    xd = {'a': x, 'b': x[:3]}
    params = mod.init(jax.random.PRNGKey(0), xd)
    out = mod.apply(params, xd)
    assert out['a'].shape == (10, 4) and out['b'].shape == (3, 4)


def test_dense_convs():
    B, N, F = 2, 6, 8
    x = jnp.asarray(rng.standard_normal((B, N, F)).astype(np.float32))
    adj = jnp.asarray((rng.random((B, N, N)) < 0.4).astype(np.float32))
    mask = jnp.asarray(np.array([[1] * 6, [1] * 4 + [0] * 2], bool))
    for mod in (DenseGCNConv(out_channels=12),
                DenseSAGEConv(out_channels=12),
                DenseGraphConv(out_channels=12),
                DenseGATConv(out_channels=4, heads=3),
                DenseGINConv(nn=MLP(channel_list=[12]))):
        params = mod.init(jax.random.PRNGKey(0), x, adj, mask=mask)
        out = mod.apply(params, x, adj, mask=mask)
        assert out.shape == (B, N, 12)
        assert np.abs(np.asarray(out[1, 4:])).sum() == 0  # masked rows zero


def test_dense_pooling():
    B, N, F, K = 2, 6, 8, 3
    x = jnp.asarray(rng.standard_normal((B, N, F)).astype(np.float32))
    adj = jnp.asarray((rng.random((B, N, N)) < 0.4).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((B, N, K)).astype(np.float32))
    out, oadj, l1, l2 = dense_diff_pool(x, adj, s)
    assert out.shape == (B, K, F) and oadj.shape == (B, K, K)
    assert np.isfinite([l1, l2]).all()
    out, oadj, l1, l2 = dense_mincut_pool(x, adj, s)
    assert out.shape == (B, K, F)
    mod = DMoNPooling(k=K)
    params = mod.init(jax.random.PRNGKey(0), x, adj)
    s2, out, oadj, sp, on, cl = mod.apply(params, x, adj)
    assert out.shape == (B, K, F)
    assert np.isfinite([sp, on, cl]).all()


def test_hgt_fused_vs_concat_parity():
    """The fused wide-gather custom-VJP path (ops/edge_attention.py)
    must match the per-relation concat path exactly — outputs AND
    gradients — including padded (out-of-range) edges."""
    data = make_hetero()
    ei = {et: np.array(v) for et, v in data.edge_index_dict.items()}
    # pad some edges out of range (loader padding convention)
    et0 = ('paper', 'cites', 'paper')
    ei[et0] = np.concatenate(
        [ei[et0], np.array([[8, 9], [3, 8]], np.int32)], axis=1)
    meta = (tuple(data.metadata()[0]), tuple(data.metadata()[1]))
    x_dict = data.x_dict

    fused = HGTConv(out_channels=32, metadata=meta, heads=4,
                    attn_path='fused')
    concat = HGTConv(out_channels=32, metadata=meta, heads=4,
                     attn_path='concat')
    params = fused.init(jax.random.PRNGKey(0), x_dict, ei)

    out_f = fused.apply(params, x_dict, ei)
    out_c = concat.apply(params, x_dict, ei)
    for t in out_f:
        np.testing.assert_allclose(np.asarray(out_f[t]),
                                   np.asarray(out_c[t]),
                                   rtol=2e-5, atol=2e-6)

    def loss(mod):
        def f(p):
            out = mod.apply(p, x_dict, ei)
            return sum(jnp.sum(v ** 2) for v in out.values())
        return f

    g_f = jax.grad(loss(fused))(params)
    g_c = jax.grad(loss(concat))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_c)}
    assert flat_f
    for k, v in flat_f:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_c[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_hgt_flash_scan_parity():
    """Past PGT_ATTN_WIDE_BYTES the fused path switches to the chunked
    online-softmax flash scan — same math, bounded transients. Force it with
    a zero cap and compare against the concat path."""
    import os
    data = make_hetero()
    ei = {et: np.array(v) for et, v in data.edge_index_dict.items()}
    et0 = ('paper', 'cites', 'paper')
    ei[et0] = np.concatenate(
        [ei[et0], np.array([[8, 9], [3, 8]], np.int32)], axis=1)
    meta = (tuple(data.metadata()[0]), tuple(data.metadata()[1]))
    x_dict = data.x_dict

    fused = HGTConv(out_channels=32, metadata=meta, heads=4,
                    attn_path='fused')
    concat = HGTConv(out_channels=32, metadata=meta, heads=4,
                     attn_path='concat')
    params = fused.init(jax.random.PRNGKey(1), x_dict, ei)

    os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
    try:
        out_2p = fused.apply(params, x_dict, ei)

        def loss(p):
            out = fused.apply(p, x_dict, ei)
            return sum(jnp.sum(v ** 2) for v in out.values())

        g_2p = jax.grad(loss)(params)
    finally:
        del os.environ['PGT_ATTN_WIDE_BYTES']
    out_c = concat.apply(params, x_dict, ei)

    def loss_c(p):
        out = concat.apply(p, x_dict, ei)
        return sum(jnp.sum(v ** 2) for v in out.values())

    g_c = jax.grad(loss_c)(params)
    for t in out_2p:
        np.testing.assert_allclose(np.asarray(out_2p[t]),
                                   np.asarray(out_c[t]),
                                   rtol=2e-5, atol=2e-6)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_c)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_2p):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_c[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_hgt_flash_multichunk_online_softmax():
    """Tiny chunk size forces many scan steps so the online max/sum
    rescale recurrence is exercised (a single chunk never rescales)."""
    import os
    data = make_hetero()
    ei = {et: np.array(v) for et, v in data.edge_index_dict.items()}
    meta = (tuple(data.metadata()[0]), tuple(data.metadata()[1]))
    x_dict = data.x_dict
    fused = HGTConv(out_channels=32, metadata=meta, heads=4,
                    attn_path='fused')
    concat = HGTConv(out_channels=32, metadata=meta, heads=4,
                     attn_path='concat')
    params = fused.init(jax.random.PRNGKey(2), x_dict, ei)
    os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
    os.environ['PGT_ATTN_CHUNK_EDGES'] = '7'
    try:
        out_f = fused.apply(params, x_dict, ei)

        def loss(p):
            out = fused.apply(p, x_dict, ei)
            return sum(jnp.sum(v ** 2) for v in out.values())

        g_f = jax.grad(loss)(params)
    finally:
        del os.environ['PGT_ATTN_WIDE_BYTES']
        del os.environ['PGT_ATTN_CHUNK_EDGES']
    out_c = concat.apply(params, x_dict, ei)
    for t in out_f:
        np.testing.assert_allclose(np.asarray(out_f[t]),
                                   np.asarray(out_c[t]),
                                   rtol=2e-5, atol=2e-6)

    def loss_c(p):
        out = concat.apply(p, x_dict, ei)
        return sum(jnp.sum(v ** 2) for v in out.values())

    g_c = jax.grad(loss_c)(params)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_c)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_f):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_c[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_han_flash_parity():
    """HANConv's giant-metapath flash path matches the XLA path."""
    import os
    data = make_hetero()
    mod = HANConv(out_channels=32, metadata=(tuple(data.metadata()[0]),
                                             tuple(data.metadata()[1])),
                  heads=4)
    params = mod.init(jax.random.PRNGKey(0), data.x_dict,
                      data.edge_index_dict)
    out_ref = mod.apply(params, data.x_dict, data.edge_index_dict)
    os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
    os.environ['PGT_ATTN_CHUNK_EDGES'] = '8'
    try:
        out_f = mod.apply(params, data.x_dict, data.edge_index_dict)
    finally:
        del os.environ['PGT_ATTN_WIDE_BYTES']
        del os.environ['PGT_ATTN_CHUNK_EDGES']
    np.testing.assert_allclose(np.asarray(out_f['paper']),
                               np.asarray(out_ref['paper']),
                               rtol=2e-5, atol=2e-6)


def test_transformer_conv_flash_parity():
    """TransformerConv past the wide cap rides the flash scan."""
    import os
    from pytorch_geometric_tpu.nn import TransformerConv
    n, e = 30, 200
    coo = np.stack([rng.integers(0, n, e),
                    rng.integers(0, n, e)]).astype(np.int32)
    x = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    mod = TransformerConv(out_channels=8, heads=2)
    params = mod.init(jax.random.PRNGKey(0), x, coo)
    out_ref = mod.apply(params, x, coo)
    g_ref = jax.grad(lambda p: jnp.sum(
        mod.apply(p, x, coo) ** 2))(params)
    os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
    os.environ['PGT_ATTN_CHUNK_EDGES'] = '32'
    try:
        out_f = mod.apply(params, x, coo)
        g_f = jax.grad(lambda p: jnp.sum(
            mod.apply(p, x, coo) ** 2))(params)
    finally:
        del os.environ['PGT_ATTN_WIDE_BYTES']
        del os.environ['PGT_ATTN_CHUNK_EDGES']
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-6)
    flat_r = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_f):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_r[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_attention_sorted_path_parity():
    """PGT_ATTN_SORT_MIN_EDGES=1 forces the dst-sort + sorted-flag
    lowering in the wide, flash, and GAT-flash paths — results must be
    identical (the sort is an internal relayout)."""
    import os
    from pytorch_geometric_tpu.nn import GATConv

    data = make_hetero()
    ei = {et: np.array(v) for et, v in data.edge_index_dict.items()}
    meta = (tuple(data.metadata()[0]), tuple(data.metadata()[1]))
    x_dict = data.x_dict
    fused = HGTConv(out_channels=32, metadata=meta, heads=4,
                    attn_path='fused')
    params = fused.init(jax.random.PRNGKey(3), x_dict, ei)
    out_ref = fused.apply(params, x_dict, ei)

    def loss(p):
        out = fused.apply(p, x_dict, ei)
        return sum(jnp.sum(v ** 2) for v in out.values())

    g_ref = jax.grad(loss)(params)

    os.environ['PGT_ATTN_SORT_MIN_EDGES'] = '1'
    try:
        # wide path, sorted
        out_s = fused.apply(params, x_dict, ei)
        g_s = jax.grad(loss)(params)
        # flash path, sorted
        os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
        os.environ['PGT_ATTN_CHUNK_EDGES'] = '8'
        out_fs = fused.apply(params, x_dict, ei)
        g_fs = jax.grad(loss)(params)
        del os.environ['PGT_ATTN_WIDE_BYTES']
        del os.environ['PGT_ATTN_CHUNK_EDGES']
        # gat flash, sorted
        n, e = 30, 200
        rng2 = np.random.default_rng(11)
        coo = np.stack([rng2.integers(0, n, e),
                        rng2.integers(0, n, e)]).astype(np.int32)
        x = jnp.asarray(
            rng2.standard_normal((n, 12)).astype(np.float32))
        gmod = GATConv(out_channels=8, heads=4)
        gparams = gmod.init(jax.random.PRNGKey(0), x, coo)
        gout_ref = gmod.apply(gparams, x, coo)
        os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
        os.environ['PGT_ATTN_CHUNK_EDGES'] = '64'
        gout_s = gmod.apply(gparams, x, coo)
        del os.environ['PGT_ATTN_WIDE_BYTES']
        del os.environ['PGT_ATTN_CHUNK_EDGES']
    finally:
        del os.environ['PGT_ATTN_SORT_MIN_EDGES']
        os.environ.pop('PGT_ATTN_WIDE_BYTES', None)
        os.environ.pop('PGT_ATTN_CHUNK_EDGES', None)

    for t in out_ref:
        np.testing.assert_allclose(np.asarray(out_s[t]),
                                   np.asarray(out_ref[t]),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(out_fs[t]),
                                   np.asarray(out_ref[t]),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gout_s), np.asarray(gout_ref),
                               rtol=2e-5, atol=2e-6)
    flat_r = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_ref)}
    for gx in (g_s, g_fs):
        for k, v in jax.tree_util.tree_leaves_with_path(gx):
            np.testing.assert_allclose(
                np.asarray(v),
                np.asarray(flat_r[jax.tree_util.keystr(k)]),
                rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_hgt_flash_layout_parity():
    """Host-precomputed FlashLayout (no device argsort) reproduces the
    in-call sorted flash path — outputs and param grads."""
    import os

    from pytorch_geometric_tpu.ops import build_hgt_flash_layouts

    data = make_hetero()
    ei = {et: np.array(v) for et, v in data.edge_index_dict.items()}
    meta = (tuple(data.metadata()[0]), tuple(data.metadata()[1]))
    x_dict = data.x_dict
    num_nodes = {t: int(x.shape[0]) for t, x in x_dict.items()}
    conv = HGTConv(out_channels=32, metadata=meta, heads=4,
                   attn_path='fused')
    params = conv.init(jax.random.PRNGKey(3), x_dict, ei)

    os.environ['PGT_ATTN_WIDE_BYTES'] = '0'
    os.environ['PGT_ATTN_CHUNK_EDGES'] = '16'
    os.environ['PGT_ATTN_SORT_MIN_EDGES'] = '1'
    try:
        out_ref = conv.apply(params, x_dict, ei)

        def loss(p, lay):
            out = conv.apply(p, x_dict, ei, flash_layouts=lay)
            return sum(jnp.sum(v ** 2) for v in out.values())

        g_ref = jax.grad(lambda p: sum(
            jnp.sum(v ** 2) for v in conv.apply(p, x_dict,
                                                ei).values()))(params)
        layouts = build_hgt_flash_layouts(meta, ei, num_nodes,
                                          chunk=16)
        out_lay = conv.apply(params, x_dict, ei,
                             flash_layouts=layouts)
        g_lay = jax.grad(loss)(params, layouts)
    finally:
        for k in ('PGT_ATTN_WIDE_BYTES', 'PGT_ATTN_CHUNK_EDGES',
                  'PGT_ATTN_SORT_MIN_EDGES'):
            del os.environ[k]

    for t in out_ref:
        np.testing.assert_allclose(np.asarray(out_lay[t]),
                                   np.asarray(out_ref[t]),
                                   rtol=2e-5, atol=1e-5)
    flat_r = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_lay):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_r[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


def test_hgt_flash_layout_dual_vs_single_bwd():
    """The dual layout's src-sorted backward and the single-layout
    backward produce identical gradients (PGT_ATTN_BWD_SRC_SORTED)."""
    import os

    from pytorch_geometric_tpu.ops import build_hgt_flash_layouts

    data = make_hetero()
    ei = {et: np.array(v) for et, v in data.edge_index_dict.items()}
    meta = (tuple(data.metadata()[0]), tuple(data.metadata()[1]))
    x_dict = data.x_dict
    num_nodes = {t: int(x.shape[0]) for t, x in x_dict.items()}
    conv = HGTConv(out_channels=32, metadata=meta, heads=4,
                   attn_path='fused')
    params = conv.init(jax.random.PRNGKey(3), x_dict, ei)

    def loss(p, lay):
        out = conv.apply(p, x_dict, ei, flash_layouts=lay)
        return sum(jnp.sum(v ** 2) for v in out.values())

    lay_dual = build_hgt_flash_layouts(meta, ei, num_nodes, chunk=16)
    assert next(iter(lay_dual.values())).s_t is not None
    os.environ['PGT_ATTN_BWD_SRC_SORTED'] = '0'
    try:
        lay_single = build_hgt_flash_layouts(meta, ei, num_nodes,
                                             chunk=16)
        assert next(iter(lay_single.values())).s_t is None
    finally:
        del os.environ['PGT_ATTN_BWD_SRC_SORTED']
    g_d = jax.grad(loss)(params, lay_dual)
    g_s = jax.grad(loss)(params, lay_single)
    flat_s = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_s)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_d):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_s[jax.tree_util.keystr(k)]),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))
