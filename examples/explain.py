"""GNNExplainer on a planted-motif graph (reference
``examples/explain/gnn_explainer.py`` flow)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_tpu.datasets import ExplainerDataset
from pytorch_geometric_tpu.explain import Explainer, GNNExplainer
from pytorch_geometric_tpu.nn.models import GCN


def main():
    data = ExplainerDataset(num_nodes=120, num_motifs=20, seed=0)[0]
    x = jnp.asarray(np.asarray(data.x))
    coo = jnp.asarray(np.asarray(data.edge_index))
    y = jnp.asarray(np.asarray(data.y))
    model = GCN(hidden_channels=64, num_layers=3, out_channels=4)
    params = model.init(jax.random.PRNGKey(0), x, coo)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, x, coo)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(400):
        params, opt, loss = step(params, opt)
    acc = float((model.apply(params, x, coo).argmax(-1) == y).mean())
    print(f'model acc {acc:.3f}')

    def model_fn(h, edge_weight=None):
        return model.apply(params, h, coo, edge_weight=edge_weight)

    pred = np.asarray(model.apply(params, x, coo).argmax(-1))
    correct_motif = np.nonzero((np.asarray(data.y) == 1)
                               & (pred == 1))[0]
    motif_node = int(correct_motif[0])
    explainer = Explainer(model_fn, GNNExplainer(epochs=150))
    out = explainer(x, coo, target=y, index=motif_node)
    em = np.asarray(out.edge_mask)
    cn = np.asarray(coo)
    # the explanation should highlight THIS node's own house motif
    base = 120
    house = np.arange(base + (motif_node - base) // 5 * 5,
                      base + (motif_node - base) // 5 * 5 + 5)
    in_house = np.isin(cn[0], house) & np.isin(cn[1], house)
    print(f'mean mask on own-motif edges: {em[in_house].mean():.3f}')
    print(f'mean mask on other edges:     {em[~in_house].mean():.3f}')


if __name__ == '__main__':
    main()
