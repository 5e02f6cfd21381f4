"""Force-field / temporal-KG models: GNNFF and RENet.

GNNFF (reference ``nn/models/gnnff.py:119``): gated node/edge blocks over
atom graphs with edge->edge triplet messages; predicts per-atom force as
a weighted sum of unit bond vectors (rotation-covariant by construction).
RENet (reference ``nn/models/re_net.py:13``): recurrent event network
over temporal knowledge graphs — per-entity neighborhood histories run
through GRUs, emitting log-probabilities over objects/subjects.

TPU design: triplet index sets are host-precomputed with static padding
(same pattern as DimeNet); the RENet GRU runs as a static python loop
over the fixed ``seq_len`` (teaching XLA an unrolled scan over tiny
sequence lengths beats ``lax.scan`` dispatch overhead here).
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np


class GaussianFilter(fnn.Module):
    """(reference ``gnnff.py:13``)."""
    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / float(offset[1] - offset[0]) ** 2
        d = dist[:, None] - offset[None, :]
        return jnp.exp(coeff * d ** 2)


def _bn(x, name, mdl):
    return fnn.LayerNorm(name=name)(x)


class GNNFF(fnn.Module):
    """Graph Neural Network Force Field (reference ``gnnff.py:119``).

    Returns per-edge force contributions summed into per-atom forces:
    ``F_i = sum_j w_ij * unit(pos_j - pos_i)``. BatchNorm in the
    reference is replaced with LayerNorm (batch statistics break under
    padded static shapes and pjit sharding).
    """
    hidden_node_channels: int = 64
    hidden_edge_channels: int = 64
    num_layers: int = 3
    num_gaussians: int = 50
    cutoff: float = 5.0

    @staticmethod
    def triplets(coo: np.ndarray, num_nodes: int,
                 max_triplets: Optional[int] = None):
        from .dimenet import triplets
        return triplets(coo, num_nodes, max_triplets)

    @fnn.compact
    def __call__(self, z: jnp.ndarray, pos: jnp.ndarray, coo: jnp.ndarray,
                 idx_kj: jnp.ndarray, idx_ji: jnp.ndarray,
                 triplet_mask: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, e = z.shape[0], coo.shape[1]
        hn, he = self.hidden_node_channels, self.hidden_edge_channels
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        valid = coo[1] < n if edge_mask is None else edge_mask

        vec = pos[src] - pos[dst]
        dist = jnp.maximum(jnp.linalg.norm(vec, axis=-1), 1e-6)
        unit = vec / dist[:, None]

        node = jnp.tanh(fnn.Embed(100, hn, name='node_emb')(z))
        edge = jnp.tanh(fnn.Dense(he, name='edge_emb')(
            GaussianFilter(0.0, self.cutoff, self.num_gaussians)(dist)))

        t_kj = jnp.minimum(idx_kj, e - 1)
        t_ji = jnp.minimum(idx_ji, e - 1)
        for layer in range(self.num_layers):
            # node block (reference NodeBlock.forward)
            c1 = jnp.concatenate([node[dst], edge], 1)
            c1 = _bn(fnn.Dense(2 * hn, name=f'nb{layer}_lin')(c1),
                     f'nb{layer}_bn1', self)
            filt, core = jnp.split(c1, 2, axis=1)
            msg = jax.nn.sigmoid(filt) * jnp.tanh(core)
            msg = jnp.where(valid[:, None], msg, 0)
            agg = jax.ops.segment_sum(msg, jnp.where(valid, dst, n), n)
            node = jnp.tanh(node + _bn(agg, f'nb{layer}_bn2', self))

            # edge block (reference EdgeBlock.forward)
            c2 = node[dst] * node[src]
            c2 = _bn(fnn.Dense(2 * he, name=f'eb{layer}_lin2')(c2),
                     f'eb{layer}_bn2', self)
            f2, k2 = jnp.split(c2, 2, axis=1)
            c2_emb = _bn(jax.nn.sigmoid(f2) * jnp.tanh(k2),
                         f'eb{layer}_bn2b', self)

            c3 = jnp.concatenate([
                node[dst[t_ji]], node[src[t_ji]], node[src[t_kj]],
                edge[t_ji], edge[t_kj]], 1)
            c3 = _bn(fnn.Dense(2 * he, name=f'eb{layer}_lin3')(c3),
                     f'eb{layer}_bn3', self)
            f3, k3 = jnp.split(c3, 2, axis=1)
            tmsg = jax.nn.sigmoid(f3) * jnp.tanh(k3)
            tmsg = jnp.where(triplet_mask[:, None], tmsg, 0)
            c3_emb = jax.ops.segment_sum(
                tmsg, jnp.where(triplet_mask, t_ji, e), e)
            c3_emb = _bn(c3_emb, f'eb{layer}_bn3b', self)
            edge = jnp.tanh(edge + c2_emb + c3_emb)

        w = fnn.Dense(1, name='force_out')(edge)[:, 0]
        contrib = jnp.where(valid, w, 0)[:, None] * unit
        return jax.ops.segment_sum(contrib, jnp.where(valid, dst, n), n)


class RENet(fnn.Module):
    """Recurrent Event Network (reference ``re_net.py:13``).

    Inputs are padded per-event histories: ``h_sub [B, seq_len, K]``
    neighbor entity ids with mask, aggregated by mean per step.
    Returns (log_prob_obj, log_prob_sub) over all entities.
    """
    num_nodes: int = 100
    num_rels: int = 10
    hidden_channels: int = 64
    seq_len: int = 5
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, sub, rel, obj, h_sub, h_sub_mask, h_obj,
                 h_obj_mask, deterministic: bool = True):
        hid = self.hidden_channels
        ent = self.param('ent', fnn.initializers.xavier_uniform(),
                         (self.num_nodes, hid))
        relp = self.param('rel', fnn.initializers.xavier_uniform(),
                          (self.num_rels, hid))
        b = sub.shape[0]

        def hist_mean(h, mask):       # [B, L, K] -> [B, L, hid]
            emb = ent[jnp.minimum(h, self.num_nodes - 1)]
            emb = jnp.where(mask[..., None], emb, 0)
            cnt = jnp.maximum(mask.sum(-1), 1)[..., None]
            return emb.sum(-2) / cnt

        hs = hist_mean(h_sub, h_sub_mask)
        ho = hist_mean(h_obj, h_obj_mask)
        se, re_, oe = ent[sub], relp[rel], ent[obj]

        def run_gru(name, center, hist):
            # Standard GRU semantics (== torch.nn.GRU, reference
            # re_net.py:75): flax GRUCell, statically unrolled with a
            # shared cell, h0 = 0.
            cell = fnn.GRUCell(features=hid, name=f'{name}')
            h = jnp.zeros((b, hid))
            for t in range(self.seq_len):
                x = jnp.concatenate([center, hist[:, t], re_], -1)
                h, _ = cell(h, x)
            return h

        g_sub = run_gru('sub_gru', se, hs)
        g_obj = run_gru('obj_gru', oe, ho)

        cat_s = jnp.concatenate([se, g_sub, re_], -1)
        cat_o = jnp.concatenate([oe, g_obj, re_], -1)
        if self.dropout > 0 and not deterministic:
            rng = self.make_rng('dropout')
            k1, k2 = jax.random.split(rng)
            keep = 1.0 - self.dropout
            cat_s = cat_s * jax.random.bernoulli(
                k1, keep, cat_s.shape) / keep
            cat_o = cat_o * jax.random.bernoulli(
                k2, keep, cat_o.shape) / keep
        lp_obj = jax.nn.log_softmax(
            fnn.Dense(self.num_nodes, name='sub_lin')(cat_s), -1)
        lp_sub = jax.nn.log_softmax(
            fnn.Dense(self.num_nodes, name='obj_lin')(cat_o), -1)
        return lp_obj, lp_sub

    @staticmethod
    def test(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """MRR and Hits@1/3/10 (reference ``re_net.py:test``)."""
        order = jnp.argsort(-logits, axis=1)
        match = order == y[:, None]
        rank = jnp.argmax(match, axis=1) + 1
        mrr = (1.0 / rank).mean()
        return jnp.stack([mrr,
                          match[:, :1].sum() / y.shape[0],
                          match[:, :3].sum() / y.shape[0],
                          match[:, :10].sum() / y.shape[0]])
