"""Link prediction with a (variational) graph auto-encoder
(reference ``examples/autoencoder.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn import GCNConv
from pytorch_geometric_tpu.nn.models import GAE
from pytorch_geometric_tpu.utils import negative_sampling


def main():
    data = pgt.datasets.FakeDataset(avg_num_nodes=600, avg_degree=8,
                                    num_channels=32)[0]
    n = data.num_nodes
    coo = np.asarray(data.edge_index)
    rng = np.random.default_rng(0)
    perm = rng.permutation(coo.shape[1])
    n_test = coo.shape[1] // 10
    test_pos = jnp.asarray(coo[:, perm[:n_test]])
    train = jnp.asarray(coo[:, perm[n_test:]].astype(np.int32))
    x = jnp.asarray(np.asarray(data.x))

    import flax.linen as fnn

    class Encoder(fnn.Module):
        @fnn.compact
        def __call__(self, x, ei):
            h = fnn.relu(GCNConv(out_channels=32)(x, ei))
            return GCNConv(out_channels=16)(h, ei)

    model = GAE(encoder=Encoder())
    params = model.init(jax.random.PRNGKey(0), x, train)
    tx = optax.adam(0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, neg):
        def loss_fn(p):
            z = model.apply(p, x, train)
            return GAE.recon_loss(z, train, neg)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(40):
        neg = negative_sampling(jax.random.PRNGKey(epoch), train, n,
                                num_neg_samples=int(train.shape[1]))
        params, opt_state, loss = step(params, opt_state,
                                       neg.astype(jnp.int32))

    z = model.apply(params, x, train)
    neg = negative_sampling(jax.random.PRNGKey(123), train, n,
                            num_neg_samples=n_test).astype(jnp.int32)
    pos_s = jax.nn.sigmoid((z[test_pos[0]] * z[test_pos[1]]).sum(-1))
    neg_s = jax.nn.sigmoid((z[neg[0]] * z[neg[1]]).sum(-1))
    auc = float((pos_s[:, None] > neg_s[None, :]).mean())
    print(f'loss {float(loss):.4f}, test AUC {auc:.4f}')


if __name__ == '__main__':
    main()
