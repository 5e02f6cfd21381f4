"""SchNet full-model parity vs the reference oracle
(``/root/reference/torch_geometric/nn/models/schnet.py:35``).

torch_cluster is absent, so both sides receive the same precomputed
radius graph through their ``interaction_graph`` hooks.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp

from pytorch_geometric_tpu.nn.models.schnet import SchNet
from pytorch_geometric_tpu.testing.oracle import transplant

rng = np.random.default_rng(7)
N_ATOMS = 20
Z = rng.integers(1, 10, N_ATOMS).astype(np.int64)
POS = (rng.standard_normal((N_ATOMS, 3)) * 2).astype(np.float32)
BATCH = np.sort(rng.integers(0, 2, N_ATOMS)).astype(np.int64)
CUTOFF = 4.0
HID, NF, NI, NG = 32, 32, 2, 16


def _radius_graph_np(pos, batch, cutoff):
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    same = batch[:, None] == batch[None]
    keep = (d <= cutoff) & same & ~np.eye(len(pos), dtype=bool)
    src, dst = np.nonzero(keep.T)  # dst-major like radius_graph
    coo = np.stack([dst, src])     # row0 -> row1 == j -> i
    return coo, d[coo[1], coo[0]]


COO, DIST = _radius_graph_np(POS, BATCH, CUTOFF)


class _FixedGraph(torch.nn.Module):
    def forward(self, pos, batch):
        return (torch.from_numpy(COO.astype(np.int64)),
                torch.from_numpy(DIST.astype(np.float32)))


def _ours_graph(pos, batch):
    coo = jnp.asarray(COO.astype(np.int32))
    return coo, jnp.asarray(DIST), jnp.ones((COO.shape[1],), bool)


def _overrides():
    out = {'embedding.embedding': lambda sd: sd['embedding.weight']}
    for i in range(NI):
        r = f'interactions.{i}'
        for ours, ref in [('filter1', f'{r}.mlp.0'),
                          ('filter2', f'{r}.mlp.2'),
                          ('lin2', f'{r}.conv.lin2'),
                          ('lin3', f'{r}.lin')]:
            out[f'interaction_{i}.{ours}.kernel'] = \
                (lambda ref: lambda sd: sd[f'{ref}.weight'].T)(ref)
            out[f'interaction_{i}.{ours}.bias'] = \
                (lambda ref: lambda sd: sd[f'{ref}.bias'])(ref)
        out[f'interaction_{i}.lin1.kernel'] = \
            (lambda r: lambda sd: sd[f'{r}.conv.lin1.weight'].T)(r)
    return out


def _run_pair(**kw):
    torch.manual_seed(0)
    ref = tg.nn.models.SchNet(
        hidden_channels=HID, num_filters=NF, num_interactions=NI,
        num_gaussians=NG, cutoff=CUTOFF, interaction_graph=_FixedGraph(),
        **{k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
           for k, v in kw.items()}).eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(Z), torch.from_numpy(POS),
                      torch.from_numpy(BATCH)).numpy()
    ours = SchNet(hidden_channels=HID, num_filters=NF,
                  num_interactions=NI, num_gaussians=NG, cutoff=CUTOFF,
                  interaction_graph=_ours_graph, **kw)
    z = jnp.asarray(Z.astype(np.int32))
    pos = jnp.asarray(POS)
    b = jnp.asarray(BATCH.astype(np.int32))
    params = ours.init(jax.random.PRNGKey(0), z, pos, b, batch_size=2)
    params = transplant(ref, params, _overrides())
    got = np.asarray(ours.apply(params, z, pos, b, batch_size=2))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-4)


def test_schnet_basic():
    _run_pair()


def test_schnet_mean_std():
    _run_pair(mean=1.5, std=0.25)


def test_schnet_atomref():
    _run_pair(atomref=rng.standard_normal((100, 1)).astype(np.float32))


def test_schnet_readout_mean():
    _run_pair(readout='mean')


def test_schnet_dipole_shape():
    # the reference dipole path needs ase (absent) — check our dipole
    # branch directly: non-negative magnitude per molecule, translation
    # of all positions leaves the dipole of a neutral sum unchanged in
    # shape/finiteness.
    ours = SchNet(hidden_channels=HID, num_filters=NF,
                  num_interactions=NI, num_gaussians=NG, cutoff=CUTOFF,
                  interaction_graph=_ours_graph, dipole=True)
    z = jnp.asarray(Z.astype(np.int32))
    pos = jnp.asarray(POS)
    b = jnp.asarray(BATCH.astype(np.int32))
    params = ours.init(jax.random.PRNGKey(0), z, pos, b, batch_size=2)
    out = ours.apply(params, z, pos, b, batch_size=2)
    assert out.shape == (2, 1)
    assert bool((out >= 0).all()) and bool(jnp.isfinite(out).all())
