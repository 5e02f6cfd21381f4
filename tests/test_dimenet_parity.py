"""DimeNet / DimeNet++ parity vs the reference oracle
(``/root/reference/torch_geometric/nn/models/dimenet.py``).

The reference's own ``forward`` needs torch_sparse (triplets) and
torch_cluster (radius_graph), both absent — so the oracle drives the
reference's rbf/sbf/emb/interaction/output blocks directly, mirroring
``dimenet.py:672-727``, on the same host-precomputed graph + triplets.
"""
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')
pytest.importorskip('sympy')

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from pytorch_geometric_tpu.nn.models.dimenet import (DimeNet,
                                                     DimeNetPlusPlus,
                                                     triplets)

rng = np.random.default_rng(11)
N = 12
Z = rng.integers(1, 10, N).astype(np.int64)
POS = (rng.standard_normal((N, 3)) * 1.5).astype(np.float32)
CUTOFF = 4.0

COO, KJ, JI, MASK = DimeNet.prepare(POS, None, CUTOFF)
T = int(MASK.sum())
KJ, JI = KJ[:T], JI[:T]


def _rename(key: str) -> str:
    key = re.sub(r'interaction_(\d+)', r'interaction_blocks.\1', key)
    key = re.sub(r'output_(\d+)', r'output_blocks.\1', key)
    key = re.sub(r'res_before_(\d+)', r'layers_before_skip.\1', key)
    key = re.sub(r'res_after_(\d+)', r'layers_after_skip.\1', key)
    key = re.sub(r'lins_(\d+)', r'lins.\1', key)
    return key


def _transplant(ref, params):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    flat = flatten_dict(params['params'])
    out = {}
    for path, leaf in flat.items():
        key = _rename('.'.join(path))
        if key == 'emb.emb':
            t = sd['emb.emb.weight']
        elif path[-1] == 'kernel':
            t = sd[key[:-len('.kernel')] + '.weight'].T
        elif path[-1] == 'bias':
            t = sd[key[:-len('.bias')] + '.bias']
        else:
            t = sd[key]
        assert t.shape == leaf.shape, (key, t.shape, leaf.shape)
        out[path] = jnp.asarray(t)
    return {'params': unflatten_dict(out)}


def _ref_forward(ref, pp: bool):
    """Mirror of reference dimenet.py:672-727 with injected graph."""
    z = torch.from_numpy(Z)
    pos = torch.from_numpy(POS)
    j = torch.from_numpy(COO[0].astype(np.int64))
    i = torch.from_numpy(COO[1].astype(np.int64))
    kj = torch.from_numpy(KJ.astype(np.int64))
    ji = torch.from_numpy(JI.astype(np.int64))
    idx_i, idx_j, idx_k = i[ji], j[ji], j[kj]
    dist = (pos[i] - pos[j]).pow(2).sum(-1).sqrt()
    if pp:
        v1 = pos[idx_j] - pos[idx_k]
        v2 = pos[idx_i] - pos[idx_j]
        a = (v2 * v1).sum(-1)
        b = torch.cross(v2, v1, dim=1).norm(dim=-1)
    else:
        v1 = pos[idx_j] - pos[idx_i]
        v2 = pos[idx_k] - pos[idx_i]
        a = (v1 * v2).sum(-1)
        b = torch.cross(v1, v2, dim=1).norm(dim=-1)
    angle = torch.atan2(b, a)
    with torch.no_grad():
        rbf = ref.rbf(dist)
        sbf = ref.sbf(dist, angle, kj)
        x = ref.emb(z, rbf, i, j)
        from torch_geometric.utils import scatter as tscatter
        P = ref.output_blocks[0](x, rbf, i, num_nodes=N)
        for ib, ob in zip(ref.interaction_blocks, ref.output_blocks[1:]):
            x = x.clone()
            # reference block forward needs idx_kj/idx_ji
            x = ib(x, rbf, sbf, kj, ji)
            P = P + ob(x, rbf, i, num_nodes=N)
        del tscatter
        return P.sum(dim=0).numpy()


def _run(pp: bool):
    torch.manual_seed(0)
    kw = dict(hidden_channels=16, out_channels=3, num_blocks=2,
              num_spherical=5, num_radial=4, cutoff=CUTOFF,
              output_initializer='glorot_orthogonal')
    if pp:
        ref = tg.nn.models.DimeNetPlusPlus(
            int_emb_size=8, basis_emb_size=4, out_emb_channels=12, **kw)
        ours = DimeNetPlusPlus(int_emb_size=8, basis_emb_size=4,
                               out_emb_channels=12, **kw)
    else:
        ref = tg.nn.models.DimeNet(num_bilinear=4, **kw)
        ours = DimeNet(num_bilinear=4, **kw)
    ref = ref.eval()
    ref_out = _ref_forward(ref, pp)
    args = (jnp.asarray(Z.astype(np.int32)), jnp.asarray(POS),
            jnp.asarray(COO.astype(np.int32)),
            jnp.asarray(KJ.astype(np.int32)),
            jnp.asarray(JI.astype(np.int32)),
            jnp.ones((T,), bool))
    params = ours.init(jax.random.PRNGKey(0), *args)
    params = _transplant(ref, params)
    got = np.asarray(ours.apply(params, *args))
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-3)


def test_dimenet_parity():
    _run(pp=False)


def test_dimenet_pp_parity():
    _run(pp=True)


def test_triplets_match_reference_definition():
    # hand-check the triplet set on a tiny graph: edges j->i; for each
    # edge (j, i), triplets are all (k -> j) with k != i.
    coo = np.array([[0, 1, 2, 1], [1, 2, 0, 0]])  # j -> i
    kj, ji, mask = triplets(coo, 3)
    got = {(int(coo[0, a]), int(coo[0, b]), int(coo[1, b]))
           for a, b, m in zip(kj, ji, mask) if m}
    expect = set()
    e = coo.shape[1]
    for b in range(e):
        jj, ii = coo[0, b], coo[1, b]
        for a in range(e):
            if coo[1, a] == jj and coo[0, a] != ii:
                expect.add((int(coo[0, a]), int(jj), int(ii)))
    assert got == expect
