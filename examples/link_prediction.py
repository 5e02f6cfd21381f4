"""Link prediction: RandomLinkSplit + GAE (reference
``examples/link_pred.py`` flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu.transforms as T
from pytorch_geometric_tpu.datasets import StochasticBlockModelDataset
from pytorch_geometric_tpu.nn import GCNConv
from pytorch_geometric_tpu.nn.models import GAE, InnerProductDecoder
from pytorch_geometric_tpu.metrics import LinkPredHitRatio


def main():
    data = StochasticBlockModelDataset(
        block_sizes=[100, 100, 100],
        edge_probs=[[0.08, 0.005, 0.005], [0.005, 0.08, 0.005],
                    [0.005, 0.005, 0.08]], num_channels=32, seed=0)[0]
    data = T.RemoveDuplicatedEdges()(data)
    train, val, test = T.RandomLinkSplit(num_val=0.1, num_test=0.2,
                                         seed=0)(data)

    import flax.linen as fnn

    class Encoder(fnn.Module):
        @fnn.compact
        def __call__(self, x, ei):
            h = fnn.relu(GCNConv(out_channels=64)(x, ei))
            return GCNConv(out_channels=32)(h, ei)

    model = GAE(encoder=Encoder())
    x = jnp.asarray(np.asarray(train.x))
    ei = jnp.asarray(np.asarray(train.edge_index))
    params = model.init(jax.random.PRNGKey(0), x, ei)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(5e-3))
    opt = tx.init(params)

    rng = np.random.default_rng(0)
    n = data.num_nodes

    @jax.jit
    def step(params, opt, neg):
        def loss_fn(p):
            z = model.apply(p, x, ei)
            return GAE.recon_loss(z, ei, neg)
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for epoch in range(300):
        neg = jnp.asarray(rng.integers(0, n, (2, ei.shape[1]))
                          .astype(np.int32))
        params, opt, loss = step(params, opt, neg)

    # evaluate AUC-style: positive vs negative scores on the test split
    z = model.apply(params, x, ei)
    pos = np.asarray(test.edge_label_index)[:, np.asarray(
        test.edge_label) == 1]
    neg = np.asarray(test.edge_label_index)[:, np.asarray(
        test.edge_label) == 0]
    ps = np.asarray(InnerProductDecoder.decode(z, jnp.asarray(pos)))
    ns = np.asarray(InnerProductDecoder.decode(z, jnp.asarray(neg)))
    labels = np.concatenate([np.ones_like(ps), np.zeros_like(ns)])
    scores = np.concatenate([ps, ns])
    order = np.argsort(-scores)
    tpr = np.cumsum(labels[order]) / max(labels.sum(), 1)
    fpr = np.cumsum(1 - labels[order]) / max((1 - labels).sum(), 1)
    auc = float(np.trapezoid(tpr, fpr))
    print(f'loss {float(loss):.4f}, test AUC {auc:.4f}')


if __name__ == '__main__':
    main()
