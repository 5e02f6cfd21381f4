"""Fourth parity batch vs reference PyG: GCN2Conv, SimpleConv,
PointGNNConv, MeshCNNConv (weights copied from the torch reference,
outputs compared allclose)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

from pytorch_geometric_tpu.nn import conv as pgconv

rng = np.random.default_rng(4)
N, E, F = 16, 44, 8
X = rng.standard_normal((N, F)).astype(np.float32)
POS = rng.standard_normal((N, 3)).astype(np.float32)
COO = np.stack([rng.integers(0, N, E),
                rng.integers(0, N, E)]).astype(np.int64)


def t(x):
    return torch.from_numpy(np.asarray(x))


def lin(ref_lin):
    d = {'kernel': jnp.asarray(ref_lin.weight.detach().numpy().T)}
    if getattr(ref_lin, 'bias', None) is not None:
        d['bias'] = jnp.asarray(ref_lin.bias.detach().numpy())
    return d


def test_gcn2_parity():
    from torch_geometric.nn import GCN2Conv as RefGCN2
    ref = RefGCN2(F, alpha=0.2, theta=0.5, layer=2,
                  shared_weights=True).eval()
    with torch.no_grad():
        want = ref(t(X), t(X), t(COO)).numpy()
    ours = pgconv.GCN2Conv(channels=F, alpha=0.2, theta=0.5, layer=2)
    params = {'params': {'weight1': jnp.asarray(
        ref.weight1.detach().numpy())}}
    got = np.asarray(ours.apply(params, jnp.asarray(X), jnp.asarray(X),
                                jnp.asarray(COO)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_simple_conv_parity():
    from torch_geometric.nn import SimpleConv as RefSimple
    for combine in (None, 'sum', 'cat', 'self_loop'):
        ref = RefSimple(aggr='mean', combine_root=combine)
        with torch.no_grad():
            want = ref(t(X), t(COO)).numpy()
        ours = pgconv.SimpleConv(aggr='mean', combine_root=combine)
        got = np.asarray(ours.apply({}, jnp.asarray(X),
                                    jnp.asarray(COO)))
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f'combine={combine}')


def test_point_gnn_parity():
    from torch_geometric.nn import PointGNNConv as RefPG
    from torch.nn import Linear, ReLU, Sequential
    C = F
    mlp_h = Sequential(Linear(C, C), ReLU(), Linear(C, 3))
    mlp_f = Sequential(Linear(3 + C, C), ReLU(), Linear(C, C))
    mlp_g = Sequential(Linear(C, C), ReLU(), Linear(C, C))
    ref = RefPG(mlp_h, mlp_f, mlp_g).eval()
    with torch.no_grad():
        want = ref(t(X), t(POS), t(COO)).numpy()
    params = {'params': {
        'mlp_h1': lin(mlp_h[0]), 'mlp_h2': lin(mlp_h[2]),
        'mlp_f1': lin(mlp_f[0]), 'mlp_f2': lin(mlp_f[2]),
        'mlp_g1': lin(mlp_g[0]), 'mlp_g2': lin(mlp_g[2]),
    }}
    ours = pgconv.PointGNNConv(channels=C)
    got = np.asarray(ours.apply(params, jnp.asarray(X),
                                jnp.asarray(POS), jnp.asarray(COO)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_meshcnn_paper_semantics():
    """The reference implementation's ``x_j`` resolves to the CENTER
    edge under its documented ``A`` layout (so ``|a-c|`` degenerates to
    0 — it contradicts its own docstring formula at
    ``meshcnn_conv.py:341-347``). We implement the paper/docstring
    math; the oracle here replicates that formula with torch weights."""
    from torch_geometric.nn import MeshCNNConv as RefMesh
    E2 = 20
    xe = rng.standard_normal((E2, 5)).astype(np.float32)
    ring = rng.integers(0, E2, (E2, 4)).astype(np.int64)
    ref = RefMesh(5, 7).eval()

    def K(i, v):
        with torch.no_grad():
            return ref.kernels[i](t(np.asarray(v, np.float32))).numpy()

    a, b, c, d = (xe[ring[:, k]] for k in range(4))
    want = (K(0, xe) + K(1, np.abs(a - c)) + K(2, a + c)
            + K(3, np.abs(b - d)) + K(4, b + d))
    # our conv folds the K1..K4 biases away (use_bias only on w0), so
    # build the oracle the same way: subtract the extra biases
    for i in range(1, 5):
        if ref.kernels[i].bias is not None:
            want = want - ref.kernels[i].bias.detach().numpy()
    params = {'params': {}}
    for k in range(5):
        params['params'][f'w{k}'] = {'kernel': jnp.asarray(
            ref.kernels[k].weight.detach().numpy().T)}
    params['params']['w0']['bias'] = jnp.asarray(
        ref.kernels[0].bias.detach().numpy())
    ours = pgconv.MeshCNNConv(out_channels=7, use_bias=True)
    got = np.asarray(ours.apply(params, jnp.asarray(xe),
                                jnp.asarray(ring)))
    np.testing.assert_allclose(got, want, atol=2e-4)
