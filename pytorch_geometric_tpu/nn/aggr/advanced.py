"""Advanced learnable aggregations: SetTransformer, GMT, LCM,
PatchTransformer, Equilibrium.

Reference: ``torch_geometric/nn/aggr/set_transformer.py``, ``gmt.py``,
``lcm.py``, ``patch_transformer.py``, ``equilibrium.py``.
"""

import math
from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from .base import Aggregation


class _MAB(fnn.Module):
    """Multihead attention block (Set Transformer building block)."""
    channels: int
    heads: int = 4

    @fnn.compact
    def __call__(self, q, kv, kv_mask=None):
        att_mask = (kv_mask[:, None, None, :] if kv_mask is not None
                    else None)
        h = fnn.MultiHeadDotProductAttention(
            num_heads=self.heads, name='att')(q, kv, mask=att_mask)
        h = fnn.LayerNorm(name='ln1')(q + h)
        ff = fnn.Dense(self.channels, name='ff')(fnn.relu(h))
        return fnn.LayerNorm(name='ln2')(h + ff)


class SetTransformerAggregation(Aggregation):
    """ISAB encoder + PMA pooling (reference ``set_transformer.py``)."""
    channels: int = 64
    num_seed_points: int = 1
    heads: int = 4
    num_encoder_blocks: int = 1

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        dense, valid = self.to_dense(x, index, dim_size, mask,
                                     max_num_elements)
        h = fnn.Dense(self.channels, name='lin_in')(dense)
        for i in range(self.num_encoder_blocks):
            h = _MAB(self.channels, self.heads, name=f'sab_{i}')(
                h, h, valid)
        seeds = self.param('seed', fnn.initializers.glorot_uniform(),
                           (self.num_seed_points, self.channels))
        q = jnp.broadcast_to(seeds[None],
                             (dim_size,) + seeds.shape)
        out = _MAB(self.channels, self.heads, name='pma')(q, h, valid)
        return out.reshape(dim_size,
                           self.num_seed_points * self.channels)


class GraphMultisetTransformer(SetTransformerAggregation):
    """GMT (reference ``gmt.py``) — Set Transformer pooling with k seed
    points; kept as a named alias with GMT defaults."""
    num_seed_points: int = 4


class LCMAggregation(Aggregation):
    """Learnable commutative monoid: balanced binary reduction with a
    learned combine cell (reference ``lcm.py``)."""
    in_channels: int = 0
    out_channels: int = 0

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        c = self.out_channels or x.shape[-1]
        dense, valid = self.to_dense(x, index, dim_size, mask,
                                     max_num_elements)
        h = fnn.Dense(c, name='lin_in')(dense)
        h = jnp.where(valid[..., None], h, 0)
        cell = fnn.GRUCell(features=c, name='combine')
        # pad to a power of two and reduce pairwise (log depth)
        L = h.shape[1]
        L2 = 1 << max(1, math.ceil(math.log2(max(L, 1))))
        h = jnp.pad(h, ((0, 0), (0, L2 - L), (0, 0)))
        v = jnp.pad(valid, ((0, 0), (0, L2 - L)))
        while h.shape[1] > 1:
            a, b = h[:, 0::2], h[:, 1::2]
            va, vb = v[:, 0::2], v[:, 1::2]
            B, P, C = a.shape
            merged, _ = cell(a.reshape(B * P, C), b.reshape(B * P, C))
            merged = merged.reshape(B, P, C)
            both = va & vb
            h = jnp.where(both[..., None], merged,
                          jnp.where(va[..., None], a, b))
            v = va | vb
            h = jnp.where(v[..., None], h, 0)
        return h[:, 0]


class PatchTransformerAggregation(Aggregation):
    """Partition each set into fixed-size patches, encode patches with a
    transformer, mean-pool (reference ``patch_transformer.py``)."""
    channels: int = 64
    patch_size: int = 8
    heads: int = 4

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        dense, valid = self.to_dense(x, index, dim_size, mask,
                                     max_num_elements)
        B, L, F = dense.shape
        P = self.patch_size
        L2 = ((L + P - 1) // P) * P
        dense = jnp.pad(dense, ((0, 0), (0, L2 - L), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, L2 - L)))
        # patch embedding: [B, L2/P, P*F] -> channels
        ph = dense.reshape(B, L2 // P, P * F)
        pv = valid.reshape(B, L2 // P, P).any(-1)
        h = fnn.Dense(self.channels, name='patch_embed')(ph)
        h = _MAB(self.channels, self.heads, name='enc')(h, h, pv)
        h = jnp.where(pv[..., None], h, 0)
        return h.sum(1) / jnp.maximum(
            pv.sum(1, keepdims=True), 1)


class EquilibriumAggregation(Aggregation):
    """Implicit aggregation via inner energy minimisation (reference
    ``equilibrium.py``): y* = argmin_y sum_i E(x_i, y), unrolled gradient
    descent (differentiable through the unrolled steps)."""
    in_channels: int = 0
    out_channels: int = 0
    num_steps: int = 10
    grad_step: float = 0.1

    @fnn.compact
    def forward(self, x, index, dim_size, mask, max_num_elements):
        from ...ops import scatter
        c = self.out_channels or x.shape[-1]
        pot = fnn.Dense(1, name='potential_out')
        h1 = fnn.Dense(32, name='potential_hidden')

        def energy(y):
            # sum_i MLP([x_i, y_seg(i)])
            z = jnp.concatenate([x, y[index]], -1)
            e = pot(fnn.softplus(h1(z)))[:, 0]
            if mask is not None:
                e = jnp.where(mask, e, 0)
            return e.sum() + 0.5 * (y ** 2).sum()   # regulariser

        y = jnp.zeros((dim_size, c), x.dtype)
        gfn = jax.grad(energy)
        for _ in range(self.num_steps):
            y = y - self.grad_step * gfn(y)
        return y
