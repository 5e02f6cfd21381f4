"""GNNExplainer oracle parity vs the reference: same model weights,
same initial masks (transplanted), same Adam schedule -> the trained
node/edge masks must match (reference
``explain/algorithm/gnn_explainer.py``: epoch-0 without regularization,
hard-mask-restricted size/entropy regularization afterwards)."""
import math
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
from torch_geometric.explain import Explainer as TExplainer
from torch_geometric.explain import GNNExplainer as TGNNExplainer
from torch_geometric.nn import GCNConv as TGCNConv

import jax
import jax.numpy as jnp

from pytorch_geometric_tpu.explain import GNNExplainer
from pytorch_geometric_tpu.nn.conv import GCNConv

rng = np.random.default_rng(77)
N, E, F, C = 14, 40, 6, 3
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(
    np.int64)
Y = rng.integers(0, C, N)
EPOCHS = 15


class _TModel(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = TGCNConv(F, C, normalize=False, add_self_loops=False)

    def forward(self, x, edge_index):
        return self.conv(x, edge_index)


def test_gnn_explainer_trajectory_parity():
    model = _TModel()
    explainer = TExplainer(
        model=model, algorithm=TGNNExplainer(epochs=EPOCHS, lr=0.01),
        explanation_type='phenomenon', node_mask_type='attributes',
        edge_mask_type='object',
        model_config=dict(mode='multiclass_classification',
                          task_level='node', return_type='raw'))
    torch.manual_seed(7)
    ref = explainer(torch.from_numpy(X), torch.from_numpy(COO),
                    target=torch.from_numpy(Y), index=3)
    r_node = ref.node_mask.detach().numpy()
    r_edge = ref.edge_mask.detach().numpy()

    # Re-derive the reference's initial masks: _initialize_masks draws
    # node randn(N, F) * 0.1 then edge randn(E) * gain * sqrt(2 / 2N)
    # as the first RNG consumers after the seed.
    torch.manual_seed(7)
    nm0 = (torch.randn(N, F) * 0.1).numpy()
    std = torch.nn.init.calculate_gain('relu') * math.sqrt(2.0 / (2 * N))
    em0 = (torch.randn(E) * std).numpy()

    conv = GCNConv(out_channels=C, normalize=False, add_self_loops=False)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = {'params': {
        'lin': {'kernel': jnp.asarray(sd['conv.lin.weight'].T)},
        'bias': jnp.asarray(sd['conv.bias'])}}
    coo_j = jnp.asarray(COO.astype(np.int32))

    def model_fn(h, edge_weight=None):
        return conv.apply(params, h, coo_j, edge_weight=edge_weight)

    out = GNNExplainer(epochs=EPOCHS, lr=0.01)(
        model_fn, jnp.asarray(X), coo_j, jnp.asarray(Y), index=3,
        node_mask_type='attributes', feat_mask_init=nm0,
        edge_mask_init=em0)

    np.testing.assert_allclose(np.asarray(out.node_mask), r_node,
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.edge_mask), r_edge,
                               rtol=1e-3, atol=2e-3)
