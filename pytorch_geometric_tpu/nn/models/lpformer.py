"""LPFormer — adaptive graph transformer for link prediction.

Reference: ``torch_geometric/nn/models/lpformer.py:18`` (LPFormer,
LPAttLayer). Per query pair (i, j) the model attends from the pair
representation over context nodes grouped by structural type — common
neighbors, 1-hop (non-CN), and >1-hop nodes filtered by PPR thresholds
— with PPR-based relative positional encodings, then scores the link
from the attended representation plus structure counts.

TPU redesign: the reference builds ragged per-pair node sets from
sparse-matrix row intersections at runtime. Here the context set is a
STATIC ``[B, K]`` table (indices, type ids, PPR scores, mask) built on
the host by :func:`build_link_context`; attention is a dense masked MHA
over the K context slots — fixed shapes, MXU-friendly, one compiled
program for every batch.
"""

from typing import Optional, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np


def build_link_context(coo: np.ndarray, num_nodes: int, pairs: np.ndarray,
                       ppr_matrix: np.ndarray, k_cn: int = 16,
                       k_onehop: int = 16, k_non1hop: int = 8,
                       thresholds: Sequence[float] = (0.0, 1e-4, 1e-2)):
    """Host: per pair, top-PPR context nodes by structural type.

    Returns (ctx_idx [B,K], ctx_type [B,K], src_ppr [B,K], tgt_ppr [B,K],
    ctx_mask [B,K]) with K = k_cn + k_onehop + k_non1hop. Types:
    0=CN, 1=1-hop, 2=>1-hop (reference ``compute_node_mask``).
    """
    import scipy.sparse as sp
    adj = sp.csr_matrix(
        (np.ones(coo.shape[1]), (coo[0], coo[1])),
        shape=(num_nodes, num_nodes)).astype(bool)
    adj = (adj + adj.T).tocsr()
    b = pairs.shape[1]
    K = k_cn + k_onehop + k_non1hop
    idx = np.zeros((b, K), np.int64)
    typ = np.zeros((b, K), np.int32)
    sppr = np.zeros((b, K), np.float32)
    tppr = np.zeros((b, K), np.float32)
    mask = np.zeros((b, K), bool)
    th_cn, th_1hop, th_non = thresholds
    for r in range(b):
        i, j = int(pairs[0, r]), int(pairs[1, r])
        ni = set(adj.indices[adj.indptr[i]:adj.indptr[i + 1]])
        nj = set(adj.indices[adj.indptr[j]:adj.indptr[j + 1]])
        ni.discard(i); ni.discard(j); nj.discard(i); nj.discard(j)
        cn = ni & nj
        onehop = (ni | nj) - cn
        pi, pj = ppr_matrix[i], ppr_matrix[j]

        def fill(cand, t, lo, cap, thresh):
            cand = [c for c in cand
                    if pi[c] >= thresh and pj[c] >= thresh]
            cand.sort(key=lambda c: -(pi[c] + pj[c]))
            cand = cand[:cap]
            hi = lo + len(cand)
            idx[r, lo:hi] = cand
            typ[r, lo:hi] = t
            sppr[r, lo:hi] = pi[cand]
            tppr[r, lo:hi] = pj[cand]
            mask[r, lo:hi] = True

        fill(list(cn), 0, 0, k_cn, th_cn)
        fill(list(onehop), 1, k_cn, k_onehop, th_1hop)
        if k_non1hop > 0:
            far = np.argsort(-(pi + pj))[:4 * k_non1hop]
            far = [c for c in far if c not in cn and c not in onehop
                   and c != i and c != j
                   and pi[c] >= th_non and pj[c] >= th_non]
            fill(far, 2, k_cn + k_onehop, k_non1hop, th_non)
    return idx, typ, sppr, tppr, mask


class LPAttLayer(fnn.Module):
    """Masked MHA from the pair representation over context slots
    (reference ``lpformer.py:615``)."""
    hidden_channels: int
    num_heads: int = 1
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, pair_feats, ctx_feats, ctx_mask,
                 deterministic: bool = True):
        H = self.num_heads
        C = self.hidden_channels
        D = C // H
        b, k, _ = ctx_feats.shape
        q = fnn.Dense(C, name='q')(pair_feats).reshape(b, 1, H, D)
        kk = fnn.Dense(C, name='k')(ctx_feats).reshape(b, k, H, D)
        vv = fnn.Dense(C, name='v')(ctx_feats).reshape(b, k, H, D)
        logits = jnp.einsum('bqhd,bkhd->bhk', q, kk) / jnp.sqrt(D)
        logits = jnp.where(ctx_mask[:, None, :], logits, -jnp.inf)
        att = jax.nn.softmax(logits, axis=-1)
        att = jnp.where(jnp.isfinite(att), att, 0)   # rows with no ctx
        out = jnp.einsum('bhk,bkhd->bhd', att, vv).reshape(b, C)
        out = fnn.Dense(C, name='o')(out)
        h = fnn.LayerNorm(name='ln1')(pair_feats + out)
        ff = fnn.Dense(C, name='ff2')(fnn.relu(
            fnn.Dense(2 * C, name='ff1')(h)))
        return fnn.LayerNorm(name='ln2')(h + ff)


class LPFormer(fnn.Module):
    """(reference ``lpformer.py:18``). Call with the output of
    :func:`build_link_context` plus GNN-ready node features."""
    in_channels: int
    hidden_channels: int = 64
    num_gnn_layers: int = 2
    num_transformer_layers: int = 1
    num_heads: int = 1
    gnn_dropout: float = 0.0
    transformer_dropout: float = 0.0

    @fnn.compact
    def __call__(self, pairs, x, edge_index, ctx_idx, ctx_type,
                 src_ppr, tgt_ppr, ctx_mask, edge_mask=None,
                 deterministic: bool = True):
        from .basic_gnn import GCN
        C = self.hidden_channels
        n = x.shape[0]
        X = GCN(hidden_channels=C, num_layers=self.num_gnn_layers,
                dropout=self.gnn_dropout, name='gnn')(
            x, edge_index, edge_mask=edge_mask,
            deterministic=deterministic)
        X = fnn.LayerNorm(name='gnn_norm')(X)

        si = jnp.minimum(pairs[0], n - 1)
        ti = jnp.minimum(pairs[1], n - 1)
        x_i, x_j = X[si], X[ti]
        elem = fnn.Dense(C, name='elementwise_lin')(x_i * x_j)

        pair_feats = fnn.Dense(C, name='pair_in')(
            jnp.concatenate([x_i, x_j], -1))

        # PPR positional encodings per type (reference get_pos_encodings):
        # symmetric sum of encoder([src_ppr, tgt_ppr]) both directions
        pe = jnp.zeros(ctx_idx.shape + (C,))
        pp = jnp.stack([src_ppr, tgt_ppr], -1)
        pq = jnp.stack([tgt_ppr, src_ppr], -1)
        for t, nm in ((0, 'cn'), (1, 'onehop'), (2, 'non1hop')):
            enc = fnn.Dense(C, name=f'ppr_encoder_{nm}')
            pe_t = enc(pp) + enc(pq)
            pe = jnp.where((ctx_type == t)[..., None], pe_t, pe)

        ctx = X[jnp.minimum(ctx_idx, n - 1)] + pe
        ctx = jnp.where(ctx_mask[..., None], ctx, 0)
        for layer in range(self.num_transformer_layers):
            pair_feats = LPAttLayer(C, self.num_heads,
                                    self.transformer_dropout,
                                    name=f'att_{layer}')(
                pair_feats, ctx, ctx_mask, deterministic)

        # structure counts (reference get_structure_cnts)
        fmask = ctx_mask.astype(jnp.float32)
        num_cn = (fmask * (ctx_type == 0)).sum(-1, keepdims=True)
        num_1hop = (fmask * (ctx_type == 1)).sum(-1, keepdims=True)
        num_non = (fmask * (ctx_type == 2)).sum(-1, keepdims=True)
        num_neigh = num_cn + num_1hop

        pairwise = fnn.Dense(C, name='pairwise_lin')(jnp.concatenate(
            [pair_feats, num_cn, num_1hop, num_non, num_neigh], -1))
        h = jnp.concatenate([elem, pairwise], -1)
        h = fnn.relu(fnn.Dense(C, name='score1')(h))
        return fnn.Dense(1, name='score2')(h)[:, 0]
