"""Parity wave 12 vs the reference PyG oracle: BasicGNN model stacks
with conv-internal MLPs (GIN, EdgeCNN — checks the plain_last=True
semantics of the conv MLP, reference basic_gnn.py:517,681),
ARLinkPredictor (attract_repel.py:5) and the ARGVA losses
(autoencoder.py:244)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import flax.linen as fnn
import jax
import jax.numpy as jnp

import pytorch_geometric_tpu.nn.models as pm

rng = np.random.default_rng(12)
N, E, F = 12, 40, 5
X = rng.standard_normal((N, F)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E), rng.integers(0, N, E)]).astype(
    np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


def _mlp_params(ref_nn):
    return {f'lin_{j}': {'kernel': jnp.asarray(
        lin.weight.detach().numpy().T),
        'bias': jnp.asarray(lin.bias.detach().numpy())}
        for j, lin in enumerate(ref_nn.lins)}


@pytest.mark.parametrize('out_channels', [4, None])
def test_gin_model_parity(out_channels):
    ref = tg.nn.models.GIN(F, 8, num_layers=2, out_channels=out_channels)
    with torch.no_grad():
        r = ref(t(X), t(COO)).numpy()
    model = pm.GIN(hidden_channels=8, num_layers=2,
                   out_channels=out_channels)
    params = {'params': {f'mlp_{i}': _mlp_params(ref.convs[i].nn)
                         for i in range(2)}}
    g = model.apply(params, jnp.asarray(X),
                    jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


def test_edgecnn_model_parity():
    ref = tg.nn.models.EdgeCNN(F, 8, num_layers=2, out_channels=4)
    with torch.no_grad():
        r = ref(t(X), t(COO)).numpy()
    model = pm.EdgeCNN(hidden_channels=8, num_layers=2, out_channels=4)
    params = {'params': {f'mlp_{i}': _mlp_params(ref.convs[i].nn)
                         for i in range(2)}}
    g = model.apply(params, jnp.asarray(X),
                    jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)


def test_arlink_predictor_parity():
    from torch_geometric.nn.models import ARLinkPredictor
    ref = ARLinkPredictor(F, 16, num_layers=3, attract_ratio=0.25)
    ref.eval()
    with torch.no_grad():
        r = ref(t(X), t(COO)).numpy()
        ra, rr = ref.encode(t(X))
        r_frac = ref.calculate_r_fraction(ra, rr)
        r_frac = float(r_frac)

    model = pm.ARLinkPredictor(in_channels=F, hidden_channels=16,
                               num_layers=3, attract_ratio=0.25)
    params = {'params': {}}
    for i, lin in enumerate(ref.lins):
        params['params'][f'lin_{i}'] = {
            'kernel': jnp.asarray(lin.weight.detach().numpy().T),
            'bias': jnp.asarray(lin.bias.detach().numpy())}
    for name, lin in (('lin_attract', ref.lin_attract),
                      ('lin_repel', ref.lin_repel)):
        params['params'][name] = {
            'kernel': jnp.asarray(lin.weight.detach().numpy().T),
            'bias': jnp.asarray(lin.bias.detach().numpy())}
    g = model.apply(params, jnp.asarray(X),
                    jnp.asarray(COO.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-5)

    ga, gr = model.apply(params, jnp.asarray(X),
                         method=lambda m, x: m.encode(x))
    np.testing.assert_allclose(np.asarray(ga), ra.numpy(), rtol=1e-4,
                               atol=1e-5)
    g_frac = float(pm.ARLinkPredictor.calculate_r_fraction(ga, gr))
    np.testing.assert_allclose(g_frac, r_frac, rtol=1e-4)


class _TDisc(torch.nn.Module):
    def __init__(self, d):
        super().__init__()
        self.seq = torch.nn.Sequential(torch.nn.Linear(d, 16),
                                       torch.nn.ReLU(),
                                       torch.nn.Linear(16, 1))

    def forward(self, z):
        return self.seq(z)


class _JDisc(fnn.Module):
    @fnn.compact
    def __call__(self, z):
        h = fnn.relu(fnn.Dense(16, name='lin0')(z))
        return fnn.Dense(1, name='lin1')(h)


def test_argva_losses_parity():
    D = 6
    Z = rng.standard_normal((N, D)).astype(np.float32)
    MU = rng.standard_normal((N, D)).astype(np.float32)
    LOGSTD = rng.standard_normal((N, D)).astype(np.float32)

    t_disc = _TDisc(D)
    ref = tg.nn.models.ARGVA(torch.nn.Identity(), t_disc)
    with torch.no_grad():
        r_reg = ref.reg_loss(t(Z)).numpy()
        r_kl = ref.kl_loss(t(MU), t(LOGSTD)).numpy()

    model = pm.ARGVA(encoder=None, discriminator=_JDisc())
    sd = {k: v.detach().numpy() for k, v in t_disc.state_dict().items()}
    params = {'params': {'discriminator': {
        'lin0': {'kernel': jnp.asarray(sd['seq.0.weight'].T),
                 'bias': jnp.asarray(sd['seq.0.bias'])},
        'lin1': {'kernel': jnp.asarray(sd['seq.2.weight'].T),
                 'bias': jnp.asarray(sd['seq.2.bias'])}}}}
    g_reg = model.apply(params, jnp.asarray(Z),
                        method=lambda m, z: m.reg_loss(z))
    np.testing.assert_allclose(np.asarray(g_reg), r_reg, rtol=1e-4,
                               atol=1e-5)
    g_kl = pm.ARGVA.kl_loss(jnp.asarray(MU), jnp.asarray(LOGSTD))
    np.testing.assert_allclose(np.asarray(g_kl), r_kl, rtol=1e-4,
                               atol=1e-5)
