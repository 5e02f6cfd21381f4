"""Graph-transformer models: SGFormer, Polynormer, GraphMixer.

Reference: ``torch_geometric/nn/models/sgformer.py``, ``polynormer.py``,
``graph_mixer.py``. SGFormer/Polynormer are reference-exact in eval
semantics (dropout layers are inference-disabled; BatchNorms run on
running statistics unless ``training=True``).
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..attention import SGFormerAttention, PolynormerAttention
from ..conv import GCNConv
from ..encoding import TemporalEncoding
from ..norm import BatchNorm


class SGFormer(fnn.Module):
    """Global linear attention + GCN hybrid (reference
    ``sgformer.py:123``): ``out = log_softmax(fc(w * gnn(x, A)
    + (1 - w) * attn(x)))`` with per-layer residuals in both branches.
    Operates on ONE (optionally padded) graph: ``mask`` marks valid
    rows of the flat ``[N, F]`` input. For multi-graph batches run the
    model per graph — flat block-diagonal batching would let the global
    attention mix nodes across graphs (the reference isolates graphs via
    ``to_dense_batch``)."""
    hidden_channels: int
    out_channels: int
    trans_num_layers: int = 2
    trans_num_heads: int = 1
    gnn_num_layers: int = 3
    graph_weight: float = 0.5
    aggregate: str = 'add'

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        hc = self.hidden_channels
        # ---- SGModule (reference sgformer.py:59-120; dropout elided) ----
        h = fnn.Dense(hc, name='tc_fc0')(x)
        h = fnn.LayerNorm(epsilon=1e-5, name='tc_ln0')(h)
        h = fnn.relu(h)
        prev = h
        for i in range(self.trans_num_layers):
            a = SGFormerAttention(channels=hc, heads=self.trans_num_heads,
                                  head_channels=hc,
                                  name=f'tc_attn_{i}')(h, mask=mask)
            h = (a + prev) / 2.0
            h = fnn.LayerNorm(epsilon=1e-5, name=f'tc_ln_{i + 1}')(h)
            h = fnn.relu(h)
            prev = h
        x1 = h
        # ---- GraphModule (reference sgformer.py:12-56) ----
        g = fnn.Dense(hc, name='gc_fc0')(x)
        g = BatchNorm(hc, name='gc_bn0')(g, training=training)
        g = fnn.relu(g)
        first = g
        for i in range(self.gnn_num_layers):
            g = GCNConv(out_channels=hc, name=f'gc_conv_{i}')(
                g, edge_index, edge_mask=edge_mask)
            g = BatchNorm(hc, name=f'gc_bn_{i + 1}')(g, training=training)
            g = fnn.relu(g)
            g = g + first
        x2 = g
        if self.aggregate == 'add':
            out = self.graph_weight * x2 + (1 - self.graph_weight) * x1
        elif self.aggregate == 'cat':
            out = jnp.concatenate([x1, x2], -1)
        else:
            raise ValueError(f'Invalid aggregate type: {self.aggregate}')
        out = fnn.Dense(self.out_channels, name='fc')(out)
        return jax.nn.log_softmax(out, -1)


class Polynormer(fnn.Module):
    """Polynomial-expressive transformer (reference ``polynormer.py:12``):
    ``local_layers`` gated GCN blocks summed into ``x_local``, then
    (when ``use_global``) linear global attention over the layer-normed
    sum. The reference toggles ``model._global`` after a local-only
    warm-up phase; here it is the ``use_global`` flag (weights are shared
    between the two modes, exactly as in the reference). Like SGFormer,
    one (optionally padded, ``mask``) graph per call — the global stage
    has no graph-boundary notion in flat layout."""
    hidden_channels: int
    out_channels: int
    local_layers: int = 7
    global_layers: int = 2
    heads: int = 1
    beta: float = 0.9
    qk_shared: bool = False
    pre_ln: bool = False
    post_bn: bool = True
    use_global: bool = False

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 training: bool = False) -> jnp.ndarray:
        inner = self.heads * self.hidden_channels
        x_local = 0.0
        for i in range(self.local_layers):
            if self.pre_ln:
                x = fnn.LayerNorm(epsilon=1e-5, name=f'pre_ln_{i}')(x)
            h = fnn.relu(fnn.Dense(inner, name=f'h_lin_{i}')(x))
            x = (GCNConv(out_channels=inner, name=f'local_conv_{i}')(
                x, edge_index, edge_mask=edge_mask)
                + fnn.Dense(inner, name=f'lin_{i}')(x))
            if self.post_bn:
                x = BatchNorm(inner, name=f'post_bn_{i}')(
                    x, training=training)
            x = fnn.relu(x)
            x = ((1 - self.beta) * fnn.LayerNorm(epsilon=1e-5, name=f'ln_{i}')(h * x)
                 + self.beta * x)
            x_local = x_local + x

        if self.use_global:
            g = fnn.LayerNorm(epsilon=1e-5, name='ln')(x_local)
            for j in range(self.global_layers):
                g = PolynormerAttention(
                    channels=inner, heads=self.heads,
                    head_channels=self.hidden_channels, beta=self.beta,
                    qk_shared=self.qk_shared,
                    name=f'global_attn_{j}')(g, mask=mask)
            out = fnn.Dense(self.out_channels, name='pred_global')(g)
        else:
            out = fnn.Dense(self.out_channels, name='pred_local')(x_local)
        return jax.nn.log_softmax(out, -1)


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
            fnn.gelu(fnn.LayerNorm(epsilon=1e-5, name='ln')(h)))
        h = h + c
        pooled = h.sum(1) / jnp.maximum(
            link_mask.sum(1, keepdims=True), 1)
        return fnn.Dense(self.out_channels, name='head')(pooled)
