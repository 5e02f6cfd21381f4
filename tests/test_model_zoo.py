"""Model-zoo tests (autoencoders, DGI, LightGCN, C&S, node2vec, KGE...)."""
import jax
import jax.numpy as jnp
import numpy as np

import pytorch_geometric_tpu.nn.models as M
import pytorch_geometric_tpu.nn.kge as KGE
from pytorch_geometric_tpu.nn import GCNConv

rng = np.random.default_rng(0)
N, E, F = 12, 40, 8
X = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
COO = jnp.asarray(np.stack([rng.integers(0, N, E),
                            rng.integers(0, N, E)]).astype(np.int32))


def test_gae_vgae():
    enc = GCNConv(out_channels=6)
    model = M.GAE(encoder=enc)
    params = model.init(jax.random.PRNGKey(0), X, COO)
    z = model.apply(params, X, COO)
    assert z.shape == (N, 6)
    neg = jnp.asarray(np.stack([rng.integers(0, N, E),
                                rng.integers(0, N, E)]).astype(np.int32))
    loss = M.GAE.recon_loss(z, COO, neg)
    assert np.isfinite(loss)

    import flax.linen as fnn

    class VarEnc(fnn.Module):
        @fnn.compact
        def __call__(self, x, ei):
            h = fnn.relu(GCNConv(out_channels=8)(x, ei))
            return (GCNConv(out_channels=4)(h, ei),
                    GCNConv(out_channels=4)(h, ei))

    model = M.VGAE(encoder=VarEnc())
    params = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), X,
                        COO)
    z, mu, logstd = model.apply(params, jax.random.PRNGKey(1), X, COO)
    assert z.shape == (N, 4)
    assert np.isfinite(M.VGAE.kl_loss(mu, logstd))


def test_jumping_knowledge():
    xs = [X, X * 2, X * 3]
    for mode, shape in (('cat', (N, 3 * F)), ('max', (N, F)),
                        ('lstm', (N, F))):
        mod = M.JumpingKnowledge(mode=mode, channels=F)
        params = mod.init(jax.random.PRNGKey(0), xs)
        out = mod.apply(params, xs)
        assert out.shape == shape


def test_dgi():
    enc = GCNConv(out_channels=16)

    def corrupt(x, ei):
        return (x[::-1], ei)

    model = M.DeepGraphInfomax(hidden_channels=16, encoder=enc,
                               corruption=corrupt)
    params = model.init(jax.random.PRNGKey(0), X, COO)
    pos_z, neg_z, s, w = model.apply(params, X, COO)
    loss = M.DeepGraphInfomax.loss(pos_z, neg_z, s, w)
    assert np.isfinite(loss)


def test_lightgcn():
    model = M.LightGCN(num_nodes=N, embedding_dim=16, num_layers=2)
    label = jnp.asarray(np.stack([rng.integers(0, N, 5),
                                  rng.integers(0, N, 5)]).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), COO, label)
    scores = model.apply(params, COO, label)
    assert scores.shape == (5,)
    loss = M.LightGCN.recommendation_loss(scores[:2], scores[2:4])
    assert np.isfinite(loss)


def test_label_prop_and_cs():
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, N)), 3)
    mask = jnp.asarray(rng.random(N) < 0.5)
    lp = M.LabelPropagation(num_layers=2, alpha=0.8)
    out = lp(y, COO, label_mask=mask)
    assert out.shape == (N, 3)
    cs = M.CorrectAndSmooth()
    soft = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((N, 3)).astype(np.float32)))
    out = cs(soft, y, mask, COO)
    assert out.shape == (N, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_linkx_pmlp_masklabel():
    mod = M.LINKX(num_nodes=N, hidden_channels=16, out_channels=3)
    params = mod.init(jax.random.PRNGKey(0), X, COO)
    out = mod.apply(params, X, COO)
    assert out.shape == (N, 3)

    mod = M.PMLP(hidden_channels=16, out_channels=3)
    params = mod.init(jax.random.PRNGKey(0), X)
    out_train = mod.apply(params, X)
    out_infer = mod.apply(params, X, COO, use_conv=True)
    assert out_train.shape == out_infer.shape == (N, 3)
    assert not np.allclose(out_train, out_infer)

    y = jnp.asarray(rng.integers(0, 4, N))
    mask = jnp.asarray(rng.random(N) < 0.5)
    mod = M.MaskLabel(num_classes=4, out_channels=F)
    params = mod.init(jax.random.PRNGKey(0), X, y, mask)
    out = mod.apply(params, X, y, mask)
    assert out.shape == (N, F)
    np.testing.assert_allclose(np.asarray(out)[~np.asarray(mask)],
                               np.asarray(X)[~np.asarray(mask)])


def test_neural_fingerprint_unet_deepgcn():
    batch = jnp.asarray((np.arange(N) // 6).astype(np.int32))
    mod = M.NeuralFingerprint(hidden_channels=16, out_channels=8,
                              num_layers=2)
    params = mod.init(jax.random.PRNGKey(0), X, COO, batch, 2)
    out = mod.apply(params, X, COO, batch, 2)
    assert out.shape == (2, 8)

    mod = M.GraphUNet(hidden_channels=16, out_channels=3, depth=2)
    params = mod.init(jax.random.PRNGKey(0), X, COO)
    out = mod.apply(params, X, COO)
    assert out.shape == (N, 3)

    mod = M.DeepGCNLayer(conv=GCNConv(out_channels=F), block='res+')
    params = mod.init(jax.random.PRNGKey(0), X, COO)
    out = mod.apply(params, X, COO)
    assert out.shape == (N, F)


def test_node2vec():
    model = M.Node2Vec(num_nodes=N, embedding_dim=8, walk_length=6,
                       context_size=4, walks_per_node=2)
    params = model.init(jax.random.PRNGKey(0))
    host_rng = np.random.default_rng(0)
    batch = np.arange(N)
    pos = model.pos_sample(host_rng, np.asarray(COO), batch)
    neg = model.neg_sample(host_rng, batch)
    assert pos.shape[1] == 4 and neg.shape[1] == 4
    loss = M.Node2Vec.loss(params, jnp.asarray(pos), jnp.asarray(neg))
    assert np.isfinite(loss)
    emb = model.apply(params)
    assert emb.shape == (N, 8)


def test_metapath2vec():
    ei = {('a', 'to', 'b'): np.stack([rng.integers(0, 4, 10),
                                      rng.integers(0, 6, 10)]).astype(
                                          np.int32),
          ('b', 'to', 'a'): np.stack([rng.integers(0, 6, 10),
                                      rng.integers(0, 4, 10)]).astype(
                                          np.int32)}
    model = M.MetaPath2Vec(
        num_nodes_dict=(('a', 4), ('b', 6)),
        metapath=(('a', 'to', 'b'), ('b', 'to', 'a')),
        embedding_dim=8, walk_length=4, context_size=3)
    params = model.init(jax.random.PRNGKey(0))
    pos = model.pos_sample(np.random.default_rng(0), ei, np.arange(4))
    neg = model.neg_sample(np.random.default_rng(0), np.arange(4))
    loss = M.MetaPath2Vec.loss(params, jnp.asarray(pos), jnp.asarray(neg))
    assert np.isfinite(loss)
    emb_a = model.apply(params, 'a')
    assert emb_a.shape == (4, 8)


def test_kge_models():
    h = jnp.asarray(rng.integers(0, N, 6))
    r = jnp.asarray(rng.integers(0, 3, 6))
    t = jnp.asarray(rng.integers(0, N, 6))
    for cls in (KGE.TransE, KGE.DistMult, KGE.ComplEx, KGE.RotatE):
        model = cls(num_nodes=N, num_relations=3, hidden_channels=8)
        params = model.init(jax.random.PRNGKey(0), h, r, t)
        score = model.apply(params, h, r, t)
        assert score.shape == (6,)
        assert np.isfinite(np.asarray(score)).all()
    h2, r2, t2 = KGE.KGEModel.random_sample(
        np.random.default_rng(0), np.asarray(h), np.asarray(r),
        np.asarray(t), N)
    assert h2.shape == (6,)
    loss = KGE.KGEModel.margin_loss(score, score * 0.5)
    assert np.isfinite(loss)
