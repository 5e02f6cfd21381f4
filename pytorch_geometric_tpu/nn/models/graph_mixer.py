"""GraphMixer building blocks (reference
``torch_geometric/nn/models/graph_mixer.py``): NodeEncoder (temporal
1-hop mean), LinkEncoder (TemporalEncoding + MLP-Mixer over the k
latest links), and ``get_latest_k_edge_attr``.

TPU notes: the reference filters future edges by boolean indexing
(dynamic shapes); here invalid edges keep their slot but get a
``-inf`` sort key and zeroed features, so the dense ``[N, k, F]``
gather has one static shape. The convenience :class:`GraphMixer`
wrapper model lives in ``transformers.py``.
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..encoding import TemporalEncoding
from ...ops import scatter
from ...utils import to_dense_batch


class NodeEncoder(fnn.Module):
    """x'_v = x_v + mean of neighbors linked within ``(t0 - T, t0]``
    (reference ``graph_mixer.py:11``; parameter-free)."""
    time_window: int

    def __call__(self, x: jnp.ndarray, edge_index: jnp.ndarray,
                 edge_time: jnp.ndarray, seed_time: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        n = x.shape[0]
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        t0 = seed_time[dst]
        keep = (edge_time <= t0) & (edge_time > t0 - self.time_window)
        if edge_mask is not None:
            keep = keep & edge_mask
        mean = scatter(x[src], dst, n, 'mean', mask=keep)
        return x + mean


def get_latest_k_edge_attr(k: int, edge_index: jnp.ndarray,
                           edge_attr: jnp.ndarray, edge_time: jnp.ndarray,
                           num_nodes: int,
                           edge_mask: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """[num_nodes, k, F] of each node's k latest incoming edge
    attributes, zero-padded (reference ``graph_mixer.py:135``).
    Edges with ``edge_mask == False`` are treated as absent."""
    coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
    col = jnp.minimum(coo[1], num_nodes - 1)
    if edge_mask is not None:
        edge_time = jnp.where(edge_mask, edge_time, -jnp.inf)
        edge_attr = jnp.where(edge_mask[:, None], edge_attr, 0)
    # stable sort by (col, -time): latest-first within each node
    order = jnp.lexsort([-edge_time, col])
    return to_dense_batch(edge_attr[order], col[order],
                          batch_size=num_nodes, max_num_nodes=k)[0]


class _MLPMixer(fnn.Module):
    """Token + channel mixing over ``[*, num_tokens, C]``
    (reference ``graph_mixer.py:60``)."""
    num_tokens: int
    in_channels: int
    out_channels: int
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        def drop(h):
            if self.dropout == 0.0 or deterministic:
                return h
            return fnn.Dropout(self.dropout, deterministic=False)(h)

        # token mixing
        h = jnp.swapaxes(fnn.LayerNorm(epsilon=1e-5, name='token_norm')(x), -1, -2)
        h = fnn.Dense(self.num_tokens // 2, name='token_lin1')(h)
        h = drop(fnn.gelu(h, approximate=False))
        h = drop(fnn.Dense(self.num_tokens, name='token_lin2')(h))
        h_token = jnp.swapaxes(h, -1, -2) + x
        # channel mixing
        h = fnn.LayerNorm(epsilon=1e-5, name='channel_norm')(h_token)
        h = fnn.Dense(4 * self.in_channels, name='channel_lin1')(h)
        h = drop(fnn.gelu(h, approximate=False))
        h = drop(fnn.Dense(self.in_channels, name='channel_lin2')(h))
        h_channel = h + h_token
        # head
        out = fnn.LayerNorm(epsilon=1e-5, name='head_norm')(h_channel).mean(-2)
        return fnn.Dense(self.out_channels, name='head_lin')(out)


class LinkEncoder(fnn.Module):
    """Encode each node's k latest incoming links (time encoding +
    edge features -> MLP-Mixer; reference ``graph_mixer.py:168``)."""
    k: int
    in_channels: int
    hidden_channels: int
    out_channels: int
    time_channels: int
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, edge_index: jnp.ndarray, edge_attr: jnp.ndarray,
                 edge_time: jnp.ndarray, seed_time: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        n = seed_time.shape[0]
        col = jnp.minimum(coo[1], n - 1)
        keep = edge_time <= seed_time[col]
        if edge_mask is not None:
            keep = keep & edge_mask
        time_enc = TemporalEncoding(self.time_channels, name='time_enc')(
            seed_time[col] - edge_time)
        h = jnp.concatenate([time_enc, edge_attr], -1)
        h = fnn.Dense(self.hidden_channels, name='temporal_head')(h)
        h = get_latest_k_edge_attr(self.k, coo, h, edge_time, n,
                                   edge_mask=keep)
        return _MLPMixer(self.k, self.hidden_channels, self.out_channels,
                         self.dropout, name='mlp_mixer')(
                             h, deterministic=deterministic)
