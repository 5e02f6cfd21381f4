"""ProteinMPNN — autoregressive protein sequence design
(reference ``torch_geometric/llm/models/protein_mpnn.py:158``).

TPU-native redesign:
  * The reference compacts valid residues with boolean indexing and
    runs torch_cluster's ``knn_graph`` — dynamic shapes. Here the
    masked tiled KNN (``nn/pool/point.py``) runs over the full padded
    residue set with a validity mask; every shape is static.
  * The reference builds the autoregressive attend-mask by fancy
    indexing a dense adjacency (``order_mask_backward[adj.bool()]``,
    reference ``:319-320``); here it is gathered per edge directly from
    (batch, in-graph position) pairs — order-independent and jittable.
"""

from itertools import product
from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..ops import scatter


def _gelu(x):
    # exact (erf) GELU — torch.nn.GELU default; flax defaults to the
    # tanh approximation, which diverges ~1e-3
    return fnn.gelu(x, approximate=False)


class PositionWiseFeedForward(fnn.Module):
    """(reference ``protein_mpnn.py:12``)."""
    hidden_channels: int

    @fnn.compact
    def __call__(self, x):
        h = _gelu(fnn.Dense(self.hidden_channels, name='lin1')(x))
        return fnn.Dense(x.shape[-1], name='lin2')(h)


class PositionalEncoding(fnn.Module):
    """Relative-offset embedding (reference ``protein_mpnn.py:25``)."""
    hidden_channels: int
    max_relative_feature: int = 32

    @fnn.compact
    def __call__(self, offset, mask):
        m = self.max_relative_feature
        d = jnp.clip(offset + m, 0, 2 * m) * mask \
            + (1 - mask) * (2 * m + 1)
        return fnn.Embed(2 * m + 2, self.hidden_channels,
                         name='emb')(d.astype(jnp.int32))


class _MPNNEncoder(fnn.Module):
    """Node+edge update layer (reference ``protein_mpnn.py:40``)."""
    hidden_channels: int
    dropout: float = 0.1
    scale: float = 30.0

    @fnn.compact
    def __call__(self, x, coo, edge_attr, edge_mask=None,
                 train: bool = False):
        n = x.shape[0]
        H = self.hidden_channels
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)

        lins = [fnn.Dense(H, name=f'out_e_msg_{k}') for k in range(3)]

        def mlp3(h):
            h = _gelu(lins[0](h))
            h = _gelu(lins[1](h))
            return lins[2](h)

        # reference Encoder.message (:97): out_e([x_i, x_j, edge_attr])
        # with _i = target = edge_index[1], _j = source = edge_index[0];
        # aggregation lands on the target (dst).
        h = jnp.concatenate([x[dst], x[src], edge_attr], -1)
        msg = mlp3(h)
        agg = scatter(msg, dst, n, 'sum', mask=edge_mask)
        dh = agg / self.scale
        drop = lambda z: fnn.Dropout(self.dropout, deterministic=not
                                     train)(z)
        x = fnn.LayerNorm(epsilon=1e-5, name='norm1')(x + drop(dh))
        x = fnn.LayerNorm(epsilon=1e-5, name='norm2')(
            x + drop(PositionWiseFeedForward(4 * H, name='dense')(x)))
        # reference edge update (:90-94) gathers x[row], x[col] in THAT
        # order (opposite suffix convention from message) and reuses
        # the same out_e MLP
        he = jnp.concatenate([x[src], x[dst], edge_attr], -1)
        he = mlp3(he)
        edge_attr = fnn.LayerNorm(epsilon=1e-5, name='norm3')(edge_attr + drop(he))
        return x, edge_attr


class _MPNNDecoder(fnn.Module):
    """Autoregressive decode layer (reference ``protein_mpnn.py:104``)."""
    hidden_channels: int
    dropout: float = 0.1
    scale: float = 30.0

    @fnn.compact
    def __call__(self, x, coo, edge_attr, x_label, attend,
                 edge_mask=None, train: bool = False):
        n = x.shape[0]
        H = self.hidden_channels
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        # reference Decoder.message (:147): _j = source = edge_index[0],
        # _i = target = edge_index[1]; aggregation on the target.
        lbl_j = x_label[src]
        h1 = jnp.concatenate([x[src], edge_attr, lbl_j], -1)
        h0 = jnp.concatenate([x[src], edge_attr,
                              jnp.zeros_like(lbl_j)], -1)
        h = h1 * attend + h0 * (1 - attend)
        h = jnp.concatenate([x[dst], h], -1)
        h = _gelu(fnn.Dense(H, name='out_v_0')(h))
        h = _gelu(fnn.Dense(H, name='out_v_1')(h))
        msg = fnn.Dense(H, name='out_v_2')(h)
        agg = scatter(msg, dst, n, 'sum', mask=edge_mask)
        drop = lambda z: fnn.Dropout(self.dropout, deterministic=not
                                     train)(z)
        x = fnn.LayerNorm(epsilon=1e-5, name='norm1')(x + drop(agg / self.scale))
        x = fnn.LayerNorm(epsilon=1e-5, name='norm2')(
            x + drop(PositionWiseFeedForward(4 * H, name='dense')(x)))
        return x


class ProteinMPNN(fnn.Module):
    """(reference ``protein_mpnn.py:158``)."""
    hidden_dim: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    num_neighbors: int = 30
    num_rbf: int = 16
    dropout: float = 0.1
    augment_eps: float = 0.2
    num_positional_embedding: int = 16
    vocab_size: int = 21

    def _rbf(self, d):
        mu = jnp.linspace(2.0, 22.0, self.num_rbf)
        sigma = (22.0 - 2.0) / self.num_rbf
        return jnp.exp(-(((d[:, None] - mu[None]) / sigma) ** 2))

    def featurize(self, x, mask, batch):
        """25 pairwise-atom RBF edge features over the masked k-NN graph
        of C-alpha positions (reference ``_featurize``, ``:230-262``)."""
        from ..nn.pool.point import knn_graph
        N_, Ca, C, O = (x[:, i, :] for i in range(4))
        b = Ca - N_
        c = C - Ca
        a = jnp.cross(b, c)
        Cb = -0.58273431 * a + 0.56802827 * b - 0.54067466 * c + Ca
        coo, valid = knn_graph(Ca, self.num_neighbors, batch=batch,
                               loop=True, mask=mask.astype(bool))
        row = jnp.minimum(coo[0], x.shape[0] - 1)
        col = jnp.minimum(coo[1], x.shape[0] - 1)
        rbf_all = []
        for A, B in product([N_, Ca, C, O, Cb], repeat=2):
            d = jnp.sqrt(((A[row] - B[col]) ** 2).sum(1) + 1e-6)
            rbf_all.append(self._rbf(d))
        return jnp.stack([row, col]), jnp.concatenate(rbf_all, -1), valid

    @fnn.compact
    def __call__(self, x, chain_seq_label, mask, chain_mask_all,
                 residue_idx, chain_encoding_all, batch=None,
                 batch_size: int = 1,
                 order_noise: Optional[jnp.ndarray] = None,
                 train: bool = False):
        n = x.shape[0]
        if batch is None:
            batch = jnp.zeros((n,), jnp.int32)
        if train and self.augment_eps > 0:
            x = x + self.augment_eps * jax.random.normal(
                self.make_rng('augment'), x.shape)

        coo, edge_attr, evalid = self.featurize(x, mask, batch)
        row = jnp.minimum(coo[0], n - 1)
        col = jnp.minimum(coo[1], n - 1)
        offset = residue_idx[row] - residue_idx[col]
        e_chains = (chain_encoding_all[row]
                    == chain_encoding_all[col]).astype(jnp.int32)
        e_pos = PositionalEncoding(self.num_positional_embedding,
                                   name='embedding')(offset, e_chains)
        h = jnp.concatenate([edge_attr, e_pos], -1)
        h = fnn.Dense(self.hidden_dim, name='edge_mlp_0')(h)
        h = fnn.LayerNorm(epsilon=1e-5, name='edge_mlp_norm')(h)
        h_e = fnn.Dense(self.hidden_dim, name='edge_mlp_1')(h)
        h_v = jnp.zeros((n, self.hidden_dim), x.dtype)

        for i in range(self.num_encoder_layers):
            h_v, h_e = _MPNNEncoder(self.hidden_dim, self.dropout,
                                    name=f'encoder_{i}')(
                h_v, coo, h_e, edge_mask=evalid, train=train)

        h_label = fnn.Embed(self.vocab_size, self.hidden_dim,
                            name='label_embedding')(
            chain_seq_label.astype(jnp.int32))

        # Autoregressive mask (reference :303-320) without the dense
        # adjacency: rank each residue by (chain_mask + 1e-4) * noise;
        # edge (r -> c) may attend iff rank[c] < rank[r] in the random
        # decoding order.
        if order_noise is None:
            order_noise = jnp.abs(jax.random.normal(
                self.make_rng('order') if self.has_rng('order')
                else jax.random.PRNGKey(0), (n,)))
        score = (chain_mask_all * mask + 1e-4) * order_noise
        # rank = position in ascending decoding order, per graph.
        # lexsort (batch primary, score secondary): adding batch*BIG to
        # an f32 score would collapse its mantissa and scramble ranks.
        ordr = jnp.lexsort((score, batch))
        rank = jnp.zeros((n,), jnp.int32).at[ordr].set(
            jnp.arange(n, dtype=jnp.int32))
        attend = (rank[col] < rank[row]).astype(x.dtype)[:, None]

        for i in range(self.num_decoder_layers):
            h_v = _MPNNDecoder(self.hidden_dim, self.dropout,
                               name=f'decoder_{i}')(
                h_v, coo, h_e, h_label, attend, edge_mask=evalid,
                train=train)

        logits = fnn.Dense(self.vocab_size, name='output')(h_v)
        return jax.nn.log_softmax(logits, axis=-1)
