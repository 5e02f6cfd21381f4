"""Graph-transformer models: SGFormer, Polynormer, GraphMixer.

Reference: ``torch_geometric/nn/models/sgformer.py``, ``polynormer.py``,
``graph_mixer.py``.
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..attention import SGFormerAttention, PolynormerAttention
from ..conv import GCNConv
from ..encoding import TemporalEncoding


class SGFormer(fnn.Module):
    """Simple global-attention + GCN hybrid (reference ``sgformer.py``):
    out = alpha * attn(x) + (1-alpha) * gcn(x, A)."""
    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    heads: int = 1
    alpha: float = 0.5

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # attention branch (node sequence = one graph)
        h = fnn.Dense(self.hidden_channels, name='attn_in')(x)
        for i in range(self.num_layers):
            a = SGFormerAttention(channels=self.hidden_channels,
                                  heads=self.heads,
                                  name=f'attn_{i}')(h)
            h = fnn.LayerNorm(name=f'attn_ln_{i}')(h + a)
        # gnn branch
        g = x
        for i in range(self.num_layers):
            g = fnn.relu(GCNConv(out_channels=self.hidden_channels,
                                 name=f'gcn_{i}')(g, edge_index,
                                                  edge_mask=edge_mask))
        out = self.alpha * h + (1 - self.alpha) * g
        return fnn.Dense(self.out_channels, name='head')(out)


class Polynormer(fnn.Module):
    """Polynomial-expressive transformer (reference ``polynormer.py``):
    local GCN stage then global linear-attention stage."""
    hidden_channels: int
    out_channels: int
    local_layers: int = 2
    global_layers: int = 2
    heads: int = 1

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = fnn.Dense(self.hidden_channels, name='lin_in')(x)
        for i in range(self.local_layers):
            g = GCNConv(out_channels=self.hidden_channels,
                        name=f'local_{i}')(h, edge_index,
                                           edge_mask=edge_mask)
            beta = self.param(f'beta_{i}', fnn.initializers.ones, (1,))
            h = fnn.relu(g) + jax.nn.sigmoid(beta) * h
        for i in range(self.global_layers):
            a = PolynormerAttention(channels=self.hidden_channels,
                                    heads=self.heads,
                                    name=f'global_{i}')(h)
            h = fnn.LayerNorm(name=f'ln_{i}')(h + a)
        return fnn.Dense(self.out_channels, name='head')(h)


class GraphMixer(fnn.Module):
    """Temporal link encoder (reference ``graph_mixer.py``): encodes each
    node's recent links with an MLP-mixer over (time-encoded) link
    features, plus mean-pooled neighbor features."""
    in_channels: int
    hidden_channels: int
    out_channels: int
    num_tokens: int = 8      # recent links per node
    time_channels: int = 16

    @fnn.compact
    def __call__(self, link_feats: jnp.ndarray, link_times: jnp.ndarray,
                 link_mask: jnp.ndarray) -> jnp.ndarray:
        """link_feats: [N, T, F] per-node recent link features (zero
        padded), link_times: [N, T] time deltas, link_mask: [N, T]."""
        te = TemporalEncoding(self.time_channels, name='time_enc')(
            link_times.reshape(-1)).reshape(
                link_times.shape + (self.time_channels,))
        h = jnp.concatenate([link_feats, te], -1)
        h = fnn.Dense(self.hidden_channels, name='token_in')(h)
        h = jnp.where(link_mask[..., None], h, 0)
        # token mixing (over the T axis)
        t = jnp.swapaxes(h, 1, 2)                      # [N, H, T]
        t = fnn.Dense(self.num_tokens, name='token_mix')(
            fnn.gelu(t))
        h = h + jnp.swapaxes(t, 1, 2)
        # channel mixing
        c = fnn.Dense(self.hidden_channels, name='chan_mix')(
            fnn.gelu(fnn.LayerNorm(name='ln')(h)))
        h = h + c
        pooled = h.sum(1) / jnp.maximum(
            link_mask.sum(1, keepdims=True), 1)
        return fnn.Dense(self.out_channels, name='head')(pooled)
