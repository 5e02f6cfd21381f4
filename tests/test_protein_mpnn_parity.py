"""ProteinMPNN parity vs the reference oracle
(``/root/reference/torch_geometric/llm/models/protein_mpnn.py``).

The reference's ``forward`` needs torch_cluster for its knn graph and
draws a random decoding order, so the oracle drives its submodules
directly (mirroring ``protein_mpnn.py:273-333``) on the same graph,
features, and a fixed decoding order.
"""
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

torch = pytest.importorskip('torch')
tg = pytest.importorskip('torch_geometric')

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from pytorch_geometric_tpu.llm.protein_mpnn import ProteinMPNN

rng = np.random.default_rng(3)
N, B = 20, 2
HID, K, ENC, DEC = 32, 6, 2, 2
X = (rng.standard_normal((N, 4, 3)) * 3).astype(np.float32)
LABELS = rng.integers(0, 21, N).astype(np.int64)
MASK = np.ones(N, np.float32)
CHAIN_MASK = np.ones(N, np.float32)
RESIDUE_IDX = np.arange(N, dtype=np.int64)
CHAIN_ENC = np.ones(N, np.int64)
BATCH = np.repeat(np.arange(B), N // B).astype(np.int64)
NOISE = np.abs(rng.standard_normal(N)).astype(np.float32)


def _rename(key: str) -> str:
    key = re.sub(r'encoder_(\d+)', r'encoder_layers.\1', key)
    key = re.sub(r'decoder_(\d+)', r'decoder_layers.\1', key)
    key = re.sub(r'out_e_msg_(\d+)', lambda m: f'out_e.{2 * int(m[1])}',
                 key)
    key = re.sub(r'out_v_(\d+)', lambda m: f'out_v.{2 * int(m[1])}',
                 key)
    key = re.sub(r'dense\.lin1', 'dense.out.0', key)
    key = re.sub(r'dense\.lin2', 'dense.out.2', key)
    key = re.sub(r'edge_mlp_0', 'edge_mlp.0', key)
    key = re.sub(r'edge_mlp_norm', 'edge_mlp.1', key)
    key = re.sub(r'edge_mlp_1', 'edge_mlp.2', key)
    return key


def _transplant(ref, params):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    out = {}
    for path, leaf in flatten_dict(params['params']).items():
        key = _rename('.'.join(path))
        if key == 'embedding.emb.embedding':
            t = sd['embedding.emb.weight']
        elif key == 'label_embedding.embedding':
            t = sd['label_embedding.weight']
        elif path[-1] == 'kernel':
            t = sd[key[:-len('.kernel')] + '.weight'].T
        elif path[-1] == 'scale':
            t = sd[key[:-len('.scale')] + '.weight']
        elif path[-1] == 'bias':
            t = sd[key[:-len('.bias')] + '.bias']
        else:
            t = sd[key]
        assert t.shape == leaf.shape, (key, t.shape, leaf.shape)
        out[path] = jnp.asarray(t)
    return {'params': unflatten_dict(out)}


def test_protein_mpnn_parity():
    torch.manual_seed(0)
    ref = tg.llm.models.ProteinMPNN(
        hidden_dim=HID, num_encoder_layers=ENC, num_decoder_layers=DEC,
        num_neighbors=K, dropout=0.0, augment_eps=0.0).eval()
    ours = ProteinMPNN(hidden_dim=HID, num_encoder_layers=ENC,
                       num_decoder_layers=DEC, num_neighbors=K,
                       dropout=0.0, augment_eps=0.0)

    # shared graph + features from our static-shape featurizer
    jx = jnp.asarray(X)
    jb = jnp.asarray(BATCH.astype(np.int32))
    coo, edge_attr, evalid = ours.featurize(jx, jnp.asarray(MASK), jb)
    assert bool(evalid.all())
    ei = torch.from_numpy(np.asarray(coo).astype(np.int64))
    ea = torch.from_numpy(np.asarray(edge_attr))

    # oracle: mirror reference forward (:273-333) with the fixed order
    row, col = ei
    offset = torch.from_numpy(RESIDUE_IDX)[row] - \
        torch.from_numpy(RESIDUE_IDX)[col]
    e_chains = ((torch.from_numpy(CHAIN_ENC)[row] -
                 torch.from_numpy(CHAIN_ENC)[col]) == 0).long()
    with torch.no_grad():
        e_pos = ref.embedding(offset, e_chains)
        h_e = ref.edge_mlp(torch.cat([ea, e_pos], dim=-1))
        h_v = torch.zeros(N, HID)
        for enc in ref.encoder_layers:
            h_v, h_e = enc(h_v, ei, h_e)
        h_label = ref.label_embedding(torch.from_numpy(LABELS))
        score = (CHAIN_MASK * MASK + 1e-4) * NOISE
        order = np.argsort(score + BATCH * 1e9)
        rank = np.zeros(N, np.int64)
        rank[order] = np.arange(N)
        attend = torch.from_numpy(
            (rank[np.asarray(col)] < rank[np.asarray(row)])
            .astype(np.float32)).unsqueeze(-1)
        for dec in ref.decoder_layers:
            h_v = dec(h_v, ei, h_e, h_label, attend)
        ref_out = torch.log_softmax(ref.output(h_v), dim=-1).numpy()

    args = (jx, jnp.asarray(LABELS.astype(np.int32)),
            jnp.asarray(MASK), jnp.asarray(CHAIN_MASK),
            jnp.asarray(RESIDUE_IDX.astype(np.int32)),
            jnp.asarray(CHAIN_ENC.astype(np.int32)), jb)
    params = ours.init(jax.random.PRNGKey(0), *args, batch_size=B,
                       order_noise=jnp.asarray(NOISE))
    params = _transplant(ref, params)
    got = np.asarray(ours.apply(params, *args, batch_size=B,
                                order_noise=jnp.asarray(NOISE)))
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-3)
