"""Parameter-free label propagation baseline
(reference ``examples/label_prop.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

import pytorch_geometric_tpu as pgt
from pytorch_geometric_tpu.nn.models import LabelPropagation


def main():
    # homophilous synthetic graph: FakeDataset wires same-class nodes
    data = pgt.datasets.StochasticBlockModelDataset(
        block_sizes=[150, 150, 150], edge_probs=0.04 * np.eye(3) + 0.002,
        num_channels=8)[0]
    n = data.num_nodes
    y = jnp.asarray(np.asarray(data.y).astype(np.int32))
    ei = jnp.asarray(np.asarray(data.edge_index).astype(np.int32))
    rng = np.random.default_rng(0)
    train_mask = jnp.asarray(rng.random(n) < 0.3)

    lp = LabelPropagation(num_layers=30, alpha=0.9)
    out = lp(jax.nn.one_hot(y, 3), ei, label_mask=train_mask)
    acc = float((jnp.argmax(out, -1) == y)[~train_mask].mean())
    print(f'label-prop held-out acc {acc:.4f}')


if __name__ == '__main__':
    main()
