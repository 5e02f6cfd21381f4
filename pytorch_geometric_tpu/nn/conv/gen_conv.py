"""GENConv, FiLMConv, PDNConv, GeneralConv, PNAConv, EGConv.

Reference files: ``nn/conv/gen_conv.py`` (DeeperGCN), ``film_conv.py``,
``pdn_conv.py``, ``general_conv.py`` (GraphGym's tunable conv),
``pna_conv.py`` (Principal Neighbourhood Aggregation), ``eg_conv.py``.
"""

from typing import Optional, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..message_passing import MessagePassing
from ..aggr import (SoftmaxAggregation, PowerMeanAggregation,
                    DegreeScalerAggregation)
from ...ops import scatter
from ...utils.core import degree


class GENConv(MessagePassing):
    """Generalized conv with softmax/powermean aggregation + MLP
    (reference ``gen_conv.py``)."""
    out_channels: int
    aggr_mode: str = 'softmax'     # softmax | powermean | add | mean | max
    t: float = 1.0
    learn_t: bool = False
    p: float = 1.0
    learn_p: bool = False
    msg_norm: bool = False
    learn_msg_scale: bool = False
    norm: Optional[str] = None
    num_layers: int = 2
    expansion: int = 2
    eps: float = 1e-7
    use_bias: bool = False     # reference gen_conv.py:135 default

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..norm import MsgNorm
        from ..models.mlp import MLP
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n_src, n_dst = x_src.shape[0], x_dst.shape[0]
        # reference gen_conv.py:150-174: project only on channel mismatch
        h_src = x_src
        if x_src.shape[-1] != self.out_channels:
            h_src = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                              name='lin_src')(x_src)
        if edge_attr is not None and edge_attr.shape[-1] != self.out_channels:
            edge_attr = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                                  name='lin_edge')(edge_attr)

        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n_src - 1)
        dst = jnp.minimum(coo[1], n_dst - 1)
        msg = h_src[src]
        if edge_attr is not None:
            msg = msg + edge_attr
        msg = fnn.relu(msg) + self.eps

        if self.aggr_mode == 'softmax':
            out = SoftmaxAggregation(t=self.t, learn=self.learn_t,
                                     name='aggr')(msg, dst, n_dst,
                                                  mask=edge_mask)
        elif self.aggr_mode == 'powermean':
            out = PowerMeanAggregation(p=self.p, learn=self.learn_p,
                                       name='aggr')(msg, dst, n_dst,
                                                    mask=edge_mask)
        else:
            out = scatter(msg, dst, n_dst, self.aggr_mode, mask=edge_mask)

        if self.msg_norm:
            # reference gen_conv.py:211: normalized against the RAW dst
            out = MsgNorm(learn_scale=self.learn_msg_scale,
                          name='msg_norm')(x_dst, out)
        h_dst = x_dst
        if x_dst.shape[-1] != self.out_channels:
            h_dst = fnn.Dense(self.out_channels, use_bias=self.use_bias,
                              name='lin_dst')(x_dst)
        out = out + h_dst
        # reference gen_conv.py:176-180: [out, out*expansion ..., out]
        channels = [self.out_channels * self.expansion] \
            * (self.num_layers - 1) + [self.out_channels]
        return MLP(channel_list=channels, norm=self.norm,
                   use_bias=self.use_bias, name='mlp')(out)


class FiLMConv(MessagePassing):
    """Feature-wise linear modulation per relation
    (reference ``film_conv.py``)."""
    out_channels: int
    num_relations: int = 1
    act: str = 'relu'

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_type: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n_src, n_dst = x_src.shape[0], x_dst.shape[0]
        act = getattr(jax.nn, self.act)
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n_src - 1)
        dst = jnp.minimum(coo[1], n_dst - 1)

        out = jnp.zeros((n_dst, self.out_channels), x_src.dtype)
        for r in range(self.num_relations):
            h = fnn.Dense(self.out_channels, use_bias=False,
                          name=f'lin_{r}')(x_src)
            film = fnn.Dense(2 * self.out_channels, name=f'film_{r}')(x_dst)
            # reference film_conv.py:96 splits beta first, then gamma
            beta, gamma = jnp.split(film, 2, axis=-1)
            msg = act(gamma[dst] * h[src] + beta[dst])
            rmask = edge_mask
            if edge_type is not None:
                tm = edge_type == r
                rmask = tm if rmask is None else (rmask & tm)
            out = out + scatter(msg, dst, n_dst, 'mean', mask=rmask)

        skip_gamma_beta = fnn.Dense(2 * self.out_channels, use_bias=False,
                                    name='film_skip')(x_dst)
        b, g = jnp.split(skip_gamma_beta, 2, axis=-1)
        h_skip = fnn.Dense(self.out_channels, use_bias=False,
                           name='lin_skip')(x_dst)
        return out + act(g * h_skip + b)


class PDNConv(MessagePassing):
    """Pathfinder discovery: edge-MLP produces scalar edge weights
    (reference ``pdn_conv.py``)."""
    out_channels: int
    hidden_channels: int = 16
    add_self_loops: bool = True
    normalize: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr: jnp.ndarray,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from .gcn_conv import gcn_norm
        n = x.shape[0]
        h = fnn.Dense(self.hidden_channels, name='mlp_0')(edge_attr)
        h = fnn.relu(h)
        w = fnn.sigmoid(fnn.Dense(1, name='mlp_1')(h))[:, 0]
        # reference pdn_conv.py:15+69: bias-free projection, root bias
        # added AFTER propagation (a pre-propagate bias would be smeared
        # through the weighted sum)
        x = fnn.Dense(self.out_channels, use_bias=False, name='lin')(x)
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        if self.normalize:
            coo, w = gcn_norm(coo, w, n,
                              add_self_loops=self.add_self_loops)
            if edge_mask is not None and self.add_self_loops:
                edge_mask = jnp.concatenate([edge_mask,
                                             jnp.ones((n,), bool)])
        out = self.propagate(coo, x=x, edge_weight=w, size=(n, n),
                             edge_mask=edge_mask)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out

    def message(self, x_j, edge_weight):
        return edge_weight[:, None] * x_j


class GeneralConv(MessagePassing):
    """GraphGym's tunable conv (reference ``general_conv.py``): optional
    skip, edge features, attention."""
    out_channels: int
    in_edge_channels: Optional[int] = None
    aggr: str = 'add'
    skip_linear: bool = False
    directed_msg: bool = True
    heads: int = 1
    attention: bool = False
    l2_normalize: bool = False

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x_src, x_dst = x if isinstance(x, tuple) else (x, x)
        n_src, n_dst = x_src.shape[0], x_dst.shape[0]
        h = fnn.Dense(self.out_channels, name='lin_msg')(x_src)
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n_src - 1)
        dst = jnp.minimum(coo[1], n_dst - 1)
        msg = h[src]
        if not self.directed_msg:
            # reference general_conv.py:141: + lin_msg_i(x_i) (dst side)
            hi = fnn.Dense(self.out_channels, name='lin_msg_i')(x_dst)
            msg = msg + hi[dst]
        if edge_attr is not None and self.in_edge_channels is not None:
            msg = msg + fnn.Dense(self.out_channels, name='lin_edge')(
                edge_attr)
        if self.attention:
            att = self.param('att', fnn.initializers.glorot_uniform(),
                             (1, self.out_channels))
            alpha = fnn.leaky_relu((msg * att).sum(-1), 0.2)
            alpha = self.edge_softmax(alpha, dst, n_dst, edge_mask)
            msg = msg * alpha[:, None]
        out = scatter(msg, dst, n_dst, self._aggr(), mask=edge_mask)
        if self.skip_linear:
            out = out + fnn.Dense(self.out_channels, name='lin_self')(x_dst)
        elif x_dst.shape[-1] == self.out_channels:
            out = out + x_dst
        if self.l2_normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out


class PNAConv(MessagePassing):
    """Principal Neighbourhood Aggregation (reference ``pna_conv.py``):
    towers x (aggregators x scalers) -> per-tower post MLP."""
    out_channels: int
    aggregators: Sequence[str] = ('mean', 'min', 'max', 'std')
    scalers: Sequence[str] = ('identity', 'amplification', 'attenuation')
    avg_deg_log: float = 1.0
    avg_deg_lin: float = 1.0
    towers: int = 1
    edge_dim: Optional[int] = None
    pre_layers: int = 1
    post_layers: int = 1
    divide_input: bool = False   # reference pna_conv.py:30 default

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_attr: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..models.mlp import MLP
        n = x.shape[0]
        F_in = x.shape[-1]
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)

        if self.divide_input:
            assert F_in % self.towers == 0
            tower_in = F_in // self.towers
            xt = x.reshape(n, self.towers, tower_in)
        else:
            tower_in = F_in
            xt = jnp.broadcast_to(x[:, None, :],
                                  (n, self.towers, F_in))
        outs = []
        for t in range(self.towers):
            hi = xt[dst, t]
            hj = xt[src, t]
            feats = [hi, hj]
            if edge_attr is not None:
                feats.append(fnn.Dense(tower_in, name=f'edge_enc_{t}')(
                    edge_attr))
            msg = jnp.concatenate(feats, -1)
            msg = MLP(channel_list=[tower_in] * self.pre_layers,
                      name=f'pre_{t}')(msg)
            agg = DegreeScalerAggregation(
                aggr=tuple(self.aggregators), scaler=tuple(self.scalers),
                avg_deg_log=self.avg_deg_log, avg_deg_lin=self.avg_deg_lin,
                name=f'aggr_{t}')(
                    msg, dst, n, mask=edge_mask)
            h = jnp.concatenate([xt[:, t], agg], -1)
            h = MLP(channel_list=[self.out_channels // self.towers]
                    * self.post_layers, name=f'post_{t}')(h)
            outs.append(h)
        out = jnp.concatenate(outs, -1)
        return fnn.Dense(self.out_channels, name='lin_out')(out)


class EGConv(MessagePassing):
    """Efficient graph conv: shared basis messages combined by per-node
    learned weights (reference ``eg_conv.py``)."""
    out_channels: int
    aggregators: Sequence[str] = ('symnorm',)
    num_heads: int = 8
    num_bases: int = 4
    add_self_loops: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from .gcn_conv import gcn_norm
        n = x.shape[0]
        assert self.out_channels % self.num_heads == 0
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        bases = fnn.Dense((self.out_channels // self.num_heads)
                          * self.num_bases, use_bias=False,
                          name='lin_bases')(x)
        comb = fnn.Dense(self.num_heads * self.num_bases
                         * len(self.aggregators), name='lin_comb')(x)

        # reference eg_conv.py:forward — when 'symnorm' is used, gcn_norm
        # REPLACES edge_index with the self-loop-augmented edge set, and
        # every other aggregator then runs over that same augmented set;
        # without symnorm, self-loops are still added when requested.
        em = edge_mask
        sym_w = None
        if self.add_self_loops:
            # static-shape add_remaining_self_loops: original loop edges
            # stay in the buffer (weight-zeroed by gcn_norm) — they must
            # also be MASKED so count-based aggregators (mean) and
            # min/max don't see the duplicates
            loop_free = coo[0] != coo[1]
            em = loop_free if em is None else (em & loop_free)
        if 'symnorm' in self.aggregators:
            coo, sym_w = gcn_norm(coo, None, n,
                                  add_self_loops=self.add_self_loops)
            if em is not None and self.add_self_loops:
                em = jnp.concatenate([em, jnp.ones((n,), bool)])
        elif self.add_self_loops:
            from ...utils.loop import add_self_loops as _asl
            coo, _ = _asl(coo, None, num_nodes=n)
            em = jnp.concatenate([em, jnp.ones((n,), bool)])
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        aggs = []
        for a in self.aggregators:
            if a == 'symnorm':
                agg = self.propagate(coo, x=bases, edge_weight=sym_w,
                                     size=(n, n), edge_mask=em)
            elif a in ('sum', 'add', 'mean', 'max', 'min', 'std', 'var'):
                if a in ('std', 'var'):
                    m1 = scatter(bases[src], dst, n, 'mean', mask=em)
                    m2 = scatter(bases[src] ** 2, dst, n, 'mean',
                                 mask=em)
                    agg = m2 - m1 * m1
                    if a == 'std':
                        agg = jnp.sqrt(jnp.maximum(agg, 1e-5))
                else:
                    agg = scatter(bases[src], dst, n, a, mask=em)
            else:
                raise ValueError(f"Unknown aggregator '{a}'")
            aggs.append(agg)
        agg = jnp.stack(aggs, 1)   # [N, A, B*(C/H)]
        ch = self.out_channels // self.num_heads
        agg = agg.reshape(n, len(self.aggregators), self.num_bases, ch)
        comb = comb.reshape(n, self.num_heads,
                            len(self.aggregators) * self.num_bases)
        agg = agg.reshape(n, len(self.aggregators) * self.num_bases, ch)
        out = jnp.einsum('nhb,nbc->nhc', comb, agg).reshape(
            n, self.out_channels)
        if self.use_bias:
            out = out + self.param('bias', fnn.initializers.zeros,
                                   (self.out_channels,))
        return out

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[:, None] * x_j
