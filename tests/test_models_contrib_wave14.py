"""Wave 14: MetaPath2Vec oracle parity + contrib (PRBCD/GRBCD attacks,
PGMExplainer) behavioral coverage.

The attacks and PGMExplainer are stochastic (the reference draws
candidate blocks / perturbations from torch's global RNG), so they get
behavioral guarantees rather than bit-exact oracles: budgets respected,
loss rises, influential nodes detected.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

import jax
import jax.numpy as jnp

rng = np.random.default_rng(3)


def test_metapath2vec_oracle():
    torch = pytest.importorskip('torch')
    from torch_geometric.nn.models import MetaPath2Vec as RefMP
    from pytorch_geometric_tpu.nn.models import MetaPath2Vec

    num_nodes = {'author': 6, 'paper': 8, 'venue': 3}
    metapath = [('author', 'writes', 'paper'),
                ('paper', 'published', 'venue'),
                ('venue', 'publishes', 'paper'),
                ('paper', 'written', 'author')]
    ei = {
        ('author', 'writes', 'paper'):
            np.stack([rng.integers(0, 6, 20), rng.integers(0, 8, 20)]),
        ('paper', 'published', 'venue'):
            np.stack([rng.integers(0, 8, 20), rng.integers(0, 3, 20)]),
        ('venue', 'publishes', 'paper'):
            np.stack([rng.integers(0, 3, 20), rng.integers(0, 8, 20)]),
        ('paper', 'written', 'author'):
            np.stack([rng.integers(0, 8, 20), rng.integers(0, 6, 20)]),
    }
    ref = RefMP({k: torch.from_numpy(v) for k, v in ei.items()},
                embedding_dim=16, metapath=metapath, walk_length=4,
                context_size=3, num_nodes_dict=num_nodes)
    ref.eval()
    # ours: per-type offsets follow the num_nodes_dict tuple order; the
    # reference sorts types alphabetically — pass them sorted
    ours = MetaPath2Vec(
        num_nodes_dict=tuple(sorted(num_nodes.items())),
        metapath=tuple(metapath), embedding_dim=16, walk_length=4,
        context_size=3)
    params = ours.init(jax.random.PRNGKey(0))
    total = sum(num_nodes.values())
    ref_emb = ref.embedding.weight.detach().numpy()
    assert ref_emb.shape[0] == total + 1    # + dummy row
    params = {'params': {'embedding': jnp.asarray(ref_emb[:total])}}

    # forward parity for each node type
    for t in num_nodes:
        with torch.no_grad():
            r = ref(t).numpy()
        o = np.asarray(ours.apply(params, t))
        np.testing.assert_allclose(o, r, rtol=1e-6)
    # batch indexing
    batch = np.array([1, 3, 0])
    with torch.no_grad():
        r = ref('paper', torch.from_numpy(batch)).numpy()
    o = np.asarray(ours.apply(params, 'paper', jnp.asarray(batch)))
    np.testing.assert_allclose(o, r, rtol=1e-6)

    # loss parity on fixed walks (indices in the shared embedding space)
    pos = rng.integers(0, total, (10, 3))
    neg = rng.integers(0, total, (10, 3))
    ref_loss = float(ref.loss(torch.from_numpy(pos), torch.from_numpy(neg)))
    our_loss = float(MetaPath2Vec.loss(params, jnp.asarray(pos),
                                       jnp.asarray(neg)))
    assert abs(ref_loss - our_loss) < 1e-5


def _toy_model():
    """1-layer weighted mean aggregation + linear head over 2 classes;
    takes (x, edge_index, edge_weight) so attacks can differentiate
    through candidate-edge weights."""
    w = jnp.asarray(rng.standard_normal((4, 2)).astype(np.float32))

    def model_fn(x, coo, weights):
        n = x.shape[0]
        agg = jnp.zeros_like(x).at[coo[1]].add(weights[:, None] * x[coo[0]])
        deg = jnp.zeros((n,)).at[coo[1]].add(weights)
        h = x + agg / jnp.maximum(deg, 1.0)[:, None]
        return h @ w

    return model_fn


def test_prbcd_attack():
    from pytorch_geometric_tpu.contrib import PRBCDAttack
    n = 20
    x = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    coo = np.stack([rng.integers(0, n, 50), rng.integers(0, n, 50)])
    labels = jnp.asarray(rng.integers(0, 2, n))
    model_fn = _toy_model()

    def loss_fn(cand, w):
        full = jnp.concatenate([jnp.asarray(coo), cand], 1)
        wfull = jnp.concatenate([jnp.ones(coo.shape[1]), w])
        logits = model_fn(x, full, wfull)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(logp, labels[:, None], 1).mean()

    atk = PRBCDAttack(block_size=200, epochs=20, lr=0.5)
    flips, wts = atk.attack(n, budget=5, loss_fn=loss_fn)
    assert flips.shape[1] <= 5
    assert (flips[0] != flips[1]).all()          # no self-loops
    # attacking with the found edges at weight 1 must not lower the loss
    base = float(loss_fn(jnp.zeros((2, 0), jnp.int32), jnp.zeros((0,))))
    attacked = float(loss_fn(jnp.asarray(flips),
                             jnp.ones(flips.shape[1])))
    assert attacked >= base - 1e-6


def test_grbcd_attack():
    from pytorch_geometric_tpu.contrib import GRBCDAttack
    n = 20
    x = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    coo = np.stack([rng.integers(0, n, 50), rng.integers(0, n, 50)])
    coo = coo[:, coo[0] != coo[1]]
    labels = np.asarray(rng.integers(0, 2, n))
    model_fn = _toy_model()
    atk = GRBCDAttack(block_size=300, seed=1)
    full, pert = atk.attack(model_fn, x, jnp.asarray(coo), labels,
                            budget=4)
    assert pert.shape[1] <= 4
    assert full.shape[1] == coo.shape[1] + pert.shape[1]
    existing = set(map(tuple, coo.T.tolist()))
    for pair in map(tuple, pert.T.tolist()):
        assert pair not in existing              # genuinely new edges


def test_pgm_explainer():
    from pytorch_geometric_tpu.contrib import PGMExplainer
    n, f = 10, 4
    x = rng.standard_normal((n, f)).astype(np.float32)
    coo = np.zeros((2, 0), np.int64)

    # prediction of node 0 depends ONLY on node 0's features (plus a
    # constant): perturbing node 0 flips it, others never do
    def model_fn(xs):
        logits = jnp.stack([xs[:, 0] * 5.0, -xs[:, 0] * 5.0], -1)
        return logits

    expl = PGMExplainer(num_samples=200, perturbation_mode='uniform',
                        seed=0)
    out = expl(model_fn, jnp.asarray(x), jnp.asarray(coo),
               target=None, index=0)
    pvals = np.asarray(out.extras['pgm_stats'])
    assert pvals[0] < 0.05                      # node 0 is significant
    assert (pvals[1:] > pvals[0]).all()
