"""Model zoo: JumpingKnowledge, DeepGraphInfomax, LightGCN, Label
Propagation, CorrectAndSmooth, LINKX, PMLP, MaskLabel, MetaLayer,
NeuralFingerprint, GraphUNet, DeepGCNLayer.

Reference files under ``torch_geometric/nn/models/``:
``jumping_knowledge.py``, ``deep_graph_infomax.py``, ``lightgcn.py``,
``label_prop.py``, ``correct_and_smooth.py``, ``linkx.py``, ``pmlp.py``,
``mask_label.py``, ``meta.py``, ``neural_fingerprint.py``,
``graph_unet.py``, ``deep_gcn_layer.py``.
"""

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..conv import GCNConv, LGConv, MFConv, GraphConv
from ..conv.gcn_conv import gcn_norm
from ..message_passing import MessagePassing
from ..pool import TopKPooling
from .mlp import MLP
from ...ops import scatter


class JumpingKnowledge(fnn.Module):
    """Combine per-layer representations: cat | max | lstm-attention
    (reference ``jumping_knowledge.py``). lstm mode scores each layer
    with a bidirectional LSTM of hidden size
    ``(num_layers * channels) // 2`` (reference :58)."""
    mode: str = 'cat'
    channels: Optional[int] = None
    num_layers: Optional[int] = None

    @fnn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        if self.mode == 'cat':
            return jnp.concatenate(list(xs), -1)
        if self.mode == 'max':
            return jnp.stack(list(xs), 0).max(0)
        if self.mode == 'lstm':
            x = jnp.stack(list(xs), 1)            # [N, L, F]
            L = x.shape[1]
            f = self.channels or x.shape[-1]
            nl = self.num_layers or L
            hidden = (nl * f) // 2
            fwd = fnn.LSTMCell(features=hidden, name='lstm_f')
            bwd = fnn.LSTMCell(features=hidden, name='lstm_b')
            cf = fwd.initialize_carry(jax.random.PRNGKey(0),
                                      x[:, 0].shape)
            cb = bwd.initialize_carry(jax.random.PRNGKey(0),
                                      x[:, 0].shape)
            outs_f, outs_b = [], []
            for t in range(L):
                cf, of = fwd(cf, x[:, t])
                cb, ob = bwd(cb, x[:, L - 1 - t])
                outs_f.append(of)
                outs_b.append(ob)
            h = jnp.concatenate([jnp.stack(outs_f, 1),
                                 jnp.stack(outs_b[::-1], 1)], -1)
            alpha = fnn.Dense(1, name='att')(h)[..., 0]   # [N, L]
            alpha = jax.nn.softmax(alpha, -1)
            return (x * alpha[..., None]).sum(1)
        raise ValueError(f"Unknown JK mode '{self.mode}'")


class DeepGraphInfomax(fnn.Module):
    """DGI (reference ``deep_graph_infomax.py``): encoder + corruption +
    bilinear discriminator."""
    hidden_channels: int
    encoder: fnn.Module
    summary: Callable = None      # (z, *args) -> summary vector
    corruption: Callable = None   # (*args) -> corrupted args

    def _summary(self, z, *args, **kwargs):
        if self.summary is not None:
            return self.summary(z, *args, **kwargs)
        return jax.nn.sigmoid(z.mean(0))

    @fnn.compact
    def __call__(self, *args, **kwargs):
        pos_z = self.encoder(*args, **kwargs)
        if self.corruption is not None:
            cor = self.corruption(*args, **kwargs)
            cor = cor if isinstance(cor, tuple) else (cor,)
            neg_z = self.encoder(*cor, **kwargs)
        else:
            neg_z = pos_z
        s = self._summary(pos_z, *args, **kwargs)
        w = self.param('weight', fnn.initializers.glorot_uniform(),
                       (self.hidden_channels, self.hidden_channels))
        return pos_z, neg_z, s, w

    @staticmethod
    def discriminate(z, summary, weight, sigmoid: bool = True):
        value = z @ weight @ summary
        return jax.nn.sigmoid(value) if sigmoid else value

    @staticmethod
    def loss(pos_z, neg_z, summary, weight) -> jnp.ndarray:
        eps = 1e-15
        pos = DeepGraphInfomax.discriminate(pos_z, summary, weight)
        neg = DeepGraphInfomax.discriminate(neg_z, summary, weight)
        return (-jnp.log(pos + eps).mean()
                - jnp.log(1 - neg + eps).mean())


class LightGCN(fnn.Module):
    """LightGCN (reference ``lightgcn.py``): embedding propagation with
    layer-averaged output + BPR ranking."""
    num_nodes: int
    embedding_dim: int
    num_layers: int = 2
    alpha: Optional[Sequence[float]] = None

    @fnn.compact
    def get_embedding(self, edge_index,
                      edge_mask: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
        emb = self.param('embedding', fnn.initializers.normal(0.1),
                         (self.num_nodes, self.embedding_dim))
        alpha = (jnp.asarray(self.alpha) if self.alpha is not None
                 else jnp.full((self.num_layers + 1,),
                               1.0 / (self.num_layers + 1)))
        x = emb
        out = alpha[0] * x
        for i in range(self.num_layers):
            x = LGConv(name=f'conv_{i}')(x, edge_index,
                                         edge_mask=edge_mask)
            out = out + alpha[i + 1] * x
        return out

    def __call__(self, edge_index, label_index,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Rank scores for (src, dst) pairs in ``label_index`` [2, K]."""
        z = self.get_embedding(edge_index, edge_mask)
        src = z[label_index[0]]
        dst = z[label_index[1]]
        return (src * dst).sum(-1)

    @staticmethod
    def recommendation_loss(pos_scores, neg_scores,
                            lambda_reg: float = 1e-4,
                            params=None) -> jnp.ndarray:
        """BPR loss (reference ``lightgcn.py:BPRLoss``)."""
        loss = -jax.nn.log_sigmoid(pos_scores - neg_scores).mean()
        if params is not None and lambda_reg > 0:
            reg = sum(jnp.sum(p ** 2) for p in
                      jax.tree_util.tree_leaves(params))
            loss = loss + lambda_reg * reg
        return loss


class LabelPropagation(MessagePassing):
    """y' = alpha * A_hat y + (1-alpha) y, K iterations
    (reference ``label_prop.py``)."""
    num_layers: int = 3
    alpha: float = 0.9

    def __call__(self, y: jnp.ndarray, edge_index,
                 label_mask: Optional[jnp.ndarray] = None,
                 edge_weight: Optional[jnp.ndarray] = None,
                 post_step: Optional[Callable] = None) -> jnp.ndarray:
        """``y``: [N, C] one-hot (or soft) labels; ``label_mask`` zeroes
        unlabeled rows before propagation."""
        n = y.shape[0]
        if label_mask is not None:
            y = jnp.where(label_mask[:, None], y, 0)
        coo, ew = gcn_norm(edge_index, edge_weight, n,
                           add_self_loops=False)
        res = (1 - self.alpha) * y
        out = y
        for _ in range(self.num_layers):
            out = self.propagate(coo, x=out, edge_weight=ew, size=(n, n))
            out = self.alpha * out + res
            out = (post_step(out) if post_step is not None
                   else jnp.clip(out, 0.0, 1.0))
        return out

    def message(self, x_j, edge_weight=None):
        return x_j if edge_weight is None else edge_weight[:, None] * x_j


class CorrectAndSmooth:
    """C&S post-processing (reference ``correct_and_smooth.py``).

    Parameter-free: a plain callable (not a flax module), so it can be
    applied directly to model outputs inside or outside jit.
    """

    def __init__(self, num_correction_layers: int = 10,
                 correction_alpha: float = 0.8,
                 num_smoothing_layers: int = 10,
                 smoothing_alpha: float = 0.8,
                 scale: float = 1.0, autoscale: bool = True):
        self.num_correction_layers = num_correction_layers
        self.correction_alpha = correction_alpha
        self.num_smoothing_layers = num_smoothing_layers
        self.smoothing_alpha = smoothing_alpha
        self.scale = scale
        self.autoscale = autoscale

    def correct(self, y_soft, y_true, train_mask, edge_index,
                edge_weight=None):
        err = jnp.where(train_mask[:, None], y_true - y_soft, 0)
        lp = LabelPropagation(num_layers=self.num_correction_layers,
                              alpha=self.correction_alpha)
        if self.autoscale:
            # reference clamps the propagated error to [-1, 1] each
            # hop and caps runaway scales at 1
            # (correct_and_smooth.py:105-113)
            sm = lp(err, edge_index, edge_weight=edge_weight,
                    post_step=lambda x: jnp.clip(x, -1.0, 1.0))
            numel = jnp.maximum(train_mask.sum(), 1)
            sigma = jnp.abs(err).sum() / numel
            denom = jnp.abs(sm).sum(-1, keepdims=True)
            scale = sigma / jnp.maximum(denom, 1e-30)
            scale = jnp.where((scale > 1000) | ~jnp.isfinite(scale),
                              1.0, scale)
            return y_soft + scale * sm
        # fixed-scale variant re-pins the training-row error each hop
        # (correct_and_smooth.py:fix_input)
        sm = lp(err, edge_index, edge_weight=edge_weight,
                post_step=lambda x: jnp.where(train_mask[:, None],
                                              err, x))
        return y_soft + self.scale * sm

    def smooth(self, y_soft, y_true, train_mask, edge_index):
        y = jnp.where(train_mask[:, None], y_true, y_soft)
        lp = LabelPropagation(num_layers=self.num_smoothing_layers,
                              alpha=self.smoothing_alpha)
        return lp(y, edge_index)

    def __call__(self, y_soft, y_true, train_mask, edge_index):
        out = self.correct(y_soft, y_true, train_mask, edge_index)
        return self.smooth(out, y_true, train_mask, edge_index)


class LINKX(fnn.Module):
    """LINKX (reference ``linkx.py``): MLP_A(A) + MLP_X(x) -> MLP_f."""
    num_nodes: int
    hidden_channels: int
    out_channels: int
    num_layers: int = 1
    num_edge_layers: int = 1
    num_node_layers: int = 1

    @fnn.compact
    def __call__(self, x: Optional[jnp.ndarray], edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        n = self.num_nodes
        # SparseLinear (reference linkx.py:20): out = A @ W + b with
        # W [N, H] a learned per-node basis, computed as a sparse
        # aggregation — one MXU-free scatter instead of an [N, N] GEMM.
        emb = self.param('edge_embed', fnn.initializers.normal(0.02),
                         (n, self.hidden_channels))
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        w_src = emb[src]
        if edge_weight is not None:
            w_src = w_src * edge_weight[:, None]
        out = scatter(w_src, dst, n, 'sum', mask=edge_mask)
        out = out + self.param('edge_bias', fnn.initializers.zeros,
                               (self.hidden_channels,))
        if self.num_edge_layers > 1:
            out = fnn.relu(out)
            out = fnn.BatchNorm(use_running_average=deterministic,
                                name='edge_norm')(out)
            out = MLP(channel_list=[self.hidden_channels]
                      * (self.num_edge_layers - 1), norm='batch_norm',
                      act_first=True,
                      name='edge_mlp')(out, deterministic=deterministic)
        # W[h_A | h_X] decomposed as cat_lin1(h_A) + cat_lin2(h_X)
        out = out + fnn.Dense(self.hidden_channels,
                              name='cat_lin1')(out)
        if x is not None:
            xx = MLP(channel_list=[self.hidden_channels]
                     * self.num_node_layers, norm='batch_norm',
                     act_first=True,
                     name='node_mlp')(x, deterministic=deterministic)
            out = out + xx
            out = out + fnn.Dense(self.hidden_channels,
                                  name='cat_lin2')(xx)
        return MLP(channel_list=[self.hidden_channels]
                   * (self.num_layers - 1) + [self.out_channels],
                   norm='batch_norm', act_first=True,
                   name='final_mlp')(fnn.relu(out),
                                     deterministic=deterministic)


class PMLP(fnn.Module):
    """PMLP (reference ``pmlp.py``): plain MLP at train time; at
    inference each linear layer is followed by parameter-free mean
    propagation with a self-loop root (``SimpleConv(aggr='mean',
    combine_root='self_loop')``), applied BEFORE the bias. The norm is
    batch-statistics LayerNorm-style BatchNorm (affine=False, no
    running stats — reference pmlp.py:61)."""
    hidden_channels: int
    out_channels: int
    num_layers: int = 2
    dropout: float = 0.0
    norm: bool = True
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x, edge_index=None,
                 use_conv: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            ch = self.out_channels if last else self.hidden_channels
            x = fnn.Dense(ch, use_bias=False, name=f'lins_{i}')(x)
            if use_conv and edge_index is not None:
                # mean over [neighbors + self] (SimpleConv with
                # combine_root='self_loop')
                n = x.shape[0]
                coo = (edge_index.coo if hasattr(edge_index, 'coo')
                       else edge_index)
                s = jnp.minimum(coo[0], n - 1)
                d = jnp.minimum(coo[1], n - 1)
                ssum = scatter(x[s], d, n, 'sum')
                cnt = scatter(jnp.ones((coo.shape[1], 1), x.dtype), d,
                              n, 'sum')
                x = (ssum + x) / (cnt + 1.0)
            if self.use_bias:
                x = x + self.param(f'bias_{i}', fnn.initializers.zeros,
                                   (ch,))
            if not last:
                if self.norm:
                    mean = x.mean(0, keepdims=True)
                    var = x.var(0, keepdims=True)
                    x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
                x = fnn.relu(x)
        return x


class MaskLabel(fnn.Module):
    """UniMP label embedding (reference ``mask_label.py``)."""
    num_classes: int
    out_channels: int
    method: str = 'add'

    @fnn.compact
    def __call__(self, x, y, mask) -> jnp.ndarray:
        emb = fnn.Embed(self.num_classes, self.out_channels,
                        name='emb')(jnp.maximum(y, 0))
        emb = jnp.where(mask[:, None], emb, 0)
        if self.method == 'add':
            return x + emb
        return jnp.concatenate([x, emb], -1)

    @staticmethod
    def ratio_mask(rng, mask, ratio: float):
        """Randomly keep (1-ratio) of the labeled entries."""
        keep = jax.random.uniform(rng, mask.shape) > ratio
        return mask & keep


class MetaLayer(fnn.Module):
    """Generic (edge, node, global) update block (reference ``meta.py``)."""
    edge_model: Optional[fnn.Module] = None
    node_model: Optional[fnn.Module] = None
    global_model: Optional[fnn.Module] = None

    @fnn.compact
    def __call__(self, x, edge_index, edge_attr=None, u=None, batch=None,
                 batch_size: int = 1,
                 edge_mask: Optional[jnp.ndarray] = None):
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        n = x.shape[0]
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        if self.edge_model is not None:
            eb = None if batch is None else batch[src]
            edge_attr = self.edge_model(x[src], x[dst], edge_attr, u, eb)
        if self.node_model is not None:
            x = self.node_model(x, coo, edge_attr, u, batch)
        if self.global_model is not None:
            u = self.global_model(x, coo, edge_attr, u, batch)
        return x, edge_attr, u


class NeuralFingerprint(fnn.Module):
    """Duvenaud fingerprints (reference ``neural_fingerprint.py``)."""
    hidden_channels: int
    out_channels: int
    num_layers: int = 3

    @fnn.compact
    def __call__(self, x, edge_index, batch=None, batch_size: int = 1,
                 node_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..pool import global_add_pool
        out = jnp.zeros((batch_size, self.out_channels), x.dtype)
        for i in range(self.num_layers):
            # reference neural_fingerprint.py:64: sigmoid after conv,
            # bias-free fingerprint projection
            x = jax.nn.sigmoid(MFConv(out_channels=self.hidden_channels,
                                      name=f'convs_{i}')(x, edge_index))
            y = jax.nn.softmax(
                fnn.Dense(self.out_channels, use_bias=False,
                          name=f'lins_{i}')(x), -1)
            out = out + global_add_pool(y, batch, batch_size,
                                        mask=node_mask)
        return out


class DeepGCNLayer(fnn.Module):
    """Pre/post-activation residual block (reference
    ``deep_gcn_layer.py``): res+ / res / dense / plain."""
    conv: fnn.Module
    norm: Optional[fnn.Module] = None
    act: Callable = fnn.relu
    block: str = 'res+'
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x, *args, **kwargs) -> jnp.ndarray:
        if self.block == 'res+':
            h = x
            if self.norm is not None:
                h = self.norm(h)
            h = self.act(h)
            h = self.conv(h, *args, **kwargs)
            return x + h
        h = self.conv(x, *args, **kwargs)
        if self.norm is not None:
            h = self.norm(h)
        h = self.act(h)
        if self.block == 'res':
            return x + h
        if self.block == 'dense':
            return jnp.concatenate([x, h], -1)
        return h


class GraphUNet(fnn.Module):
    """Graph U-Net (reference ``graph_unet.py``): GCN + TopK down path
    with A^2 adjacency augmentation before each pool, unpool + skip-sum
    up path.

    TPU design note: levels run on DENSE adjacencies — the augmented
    A^2 has data-dependent sparsity, so the reference's spspmm becomes
    one [n_l, n_l] MXU matmul per level, and pooling is a static-shape
    row/column gather. U-Nets run on modest graphs where n^2 is cheap;
    each level's node count ceil(ratio^l * N) is static."""
    hidden_channels: int
    out_channels: int
    depth: int = 3
    pool_ratio: float = 0.5
    sum_res: bool = True

    @staticmethod
    def _gcn_agg(A, h):
        """Dense GCN aggregation: D^-1/2 A_hat D^-1/2 h, where A_hat
        keeps existing self-loop weights and fills missing ones with 2
        (reference GraphUNet uses GCNConv(improved=True), whose
        gcn_norm fill_value is 2.0; add_remaining_self_loops)."""
        n = A.shape[0]
        diag = jnp.diagonal(A)
        fill = jnp.where(diag == 0, 2.0, 0.0)
        Ah = A + jnp.eye(n, dtype=A.dtype) * fill
        deg = Ah.sum(1)
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
        An = dinv[:, None] * Ah * dinv[None, :]
        return An @ h

    @fnn.compact
    def __call__(self, x, edge_index,
                 edge_weight: Optional[jnp.ndarray] = None,
                 batch: Optional[jnp.ndarray] = None,
                 edge_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        del batch                         # single-graph dense path
        n = x.shape[0]
        H = self.hidden_channels
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        w = (jnp.ones((coo.shape[1],), x.dtype) if edge_weight is None
             else edge_weight)
        if edge_mask is not None:
            w = jnp.where(edge_mask, w, 0.0)
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        # transposed adjacency: A[i, j] = weight of edge j -> i, so the
        # GCN aggregation is one row-major matmul
        A = jnp.zeros((n, n), x.dtype).at[dst, src].add(w)

        def conv(name, A, x, out_ch):
            h = fnn.Dense(out_ch, use_bias=False, name=name)(x)
            b = self.param(f'{name}_bias', fnn.initializers.zeros,
                           (out_ch,))
            return self._gcn_agg(A, h) + b

        x = fnn.relu(conv('down_convs_0', A, x, H))
        xs, adjs, perms = [x], [A], []
        cur_x, cur_A = x, A
        cur_n = n
        for i in range(1, self.depth + 1):
            # augment: (A+I)^2 with self-loops removed
            eye = jnp.eye(cur_n, dtype=x.dtype)
            A1 = cur_A * (1 - eye) + eye
            A2 = A1 @ A1
            A2 = A2 * (1 - eye)
            # TopK pool (reference SelectTopK, tanh activation)
            pw = self.param(f'pools_{i - 1}_weight',
                            fnn.initializers.uniform(1.0), (1, H))
            score = (cur_x * pw).sum(-1) / jnp.maximum(
                jnp.linalg.norm(pw), 1e-12)
            k = max(int(-(-self.pool_ratio * cur_n // 1)), 1)
            _, perm = jax.lax.top_k(score, k)
            cur_x = cur_x[perm] * jnp.tanh(score[perm])[:, None]
            cur_A = A2[perm][:, perm]
            cur_n = k
            cur_x = fnn.relu(conv(f'down_convs_{i}', cur_A, cur_x, H))
            perms.append(perm)
            if i < self.depth:
                xs.append(cur_x)
                adjs.append(cur_A)

        for i in range(self.depth):
            j = self.depth - 1 - i
            res, A_j, perm = xs[j], adjs[j], perms[j]
            up = jnp.zeros_like(res).at[perm].set(cur_x)
            cur_x = (res + up if self.sum_res
                     else jnp.concatenate([res, up], -1))
            out_ch = H if i < self.depth - 1 else self.out_channels
            cur_x = conv(f'up_convs_{i}', A_j, cur_x, out_ch)
            if i < self.depth - 1:
                cur_x = fnn.relu(cur_x)
        return cur_x


class HeteroJumpingKnowledge(fnn.Module):
    """Per-type JumpingKnowledge (reference
    ``jumping_knowledge.py:103``)."""
    types: Sequence[str]
    mode: str = 'cat'
    channels: Optional[int] = None
    num_layers: Optional[int] = None

    @fnn.compact
    def __call__(self, xs_dict):
        out = {}
        for t in self.types:
            jk = JumpingKnowledge(mode=self.mode, channels=self.channels,
                                  name=f'jk_{t}')
            out[t] = jk(xs_dict[t])
        return out


class ARLinkPredictor(fnn.Module):
    """Attract-Repel link predictor (reference
    ``nn/models/attract_repel.py:5``): embeddings split into attract /
    repel halves; score = <a_i, a_j> - <r_i, r_j>."""
    in_channels: int
    hidden_channels: int
    out_channels: Optional[int] = None
    num_layers: int = 2
    dropout: float = 0.0
    attract_ratio: float = 0.5

    def _dims(self):
        out = self.out_channels or self.hidden_channels
        a = int(out * self.attract_ratio)
        return a, out - a

    @fnn.compact
    def encode(self, x, deterministic: bool = True):
        h = x
        for i in range(self.num_layers - 1):
            h = fnn.relu(fnn.Dense(self.hidden_channels,
                                   name=f'lin_{i}')(h))
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng('dropout')
                keep = 1.0 - self.dropout
                h = h * jax.random.bernoulli(rng, keep, h.shape) / keep
        a_dim, r_dim = self._dims()
        return (fnn.Dense(a_dim, name='lin_attract')(h),
                fnn.Dense(r_dim, name='lin_repel')(h))

    def __call__(self, x, edge_index, deterministic: bool = True):
        attract, repel = self.encode(x, deterministic)
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        src, dst = coo[0], coo[1]
        score = ((attract[src] * attract[dst]).sum(-1)
                 - (repel[src] * repel[dst]).sum(-1))
        return jax.nn.sigmoid(score)

    @staticmethod
    def calculate_r_fraction(attract_emb, repel_emb):
        r2 = (repel_emb ** 2).sum()
        a2 = (attract_emb ** 2).sum()
        return r2 / jnp.maximum(a2 + r2, 1e-12)


def to_captum_model(*args, **kwargs):  # pragma: no cover - torch-only
    """The reference's captum bridge (``nn/models/captum.py``) is
    torch-autograd-specific; for attribution use ``explain.Explainer``
    with GNNExplainer/AttentionExplainer, or ``jax.grad`` directly."""
    raise ImportError('to_captum_model requires torch-captum; use '
                      'pytorch_geometric_tpu.explain instead')


def to_captum_input(*args, **kwargs):  # pragma: no cover
    raise ImportError('to_captum_input requires torch-captum; use '
                      'pytorch_geometric_tpu.explain instead')


def captum_output_to_dicts(*args, **kwargs):  # pragma: no cover
    raise ImportError('captum_output_to_dicts requires torch-captum')
