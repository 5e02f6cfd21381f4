"""Explanation algorithms.

Reference: ``torch_geometric/explain/algorithm/gnn_explainer.py:24``
(mask training), ``dummy_explainer.py``, ``attention_explainer.py``.

TPU redesign: the reference injects masks into ``MessagePassing`` via
module hooks (``message_passing.py:743``); here the model is a pure
function of ``(params, x, edge_index, edge_mask)`` — the mask enters as
a differentiable per-edge weight (our convs accept ``edge_mask``; for
soft masks the algorithm multiplies messages through ``edge_weight`` or
feature masking), so the whole mask optimisation is ONE jitted loop.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .explanation import Explanation


class ExplainerAlgorithm:
    def __call__(self, model_fn, x, edge_index, target, **kwargs
                 ) -> Explanation:
        raise NotImplementedError


class DummyExplainer(ExplainerAlgorithm):
    """Random masks (reference ``dummy_explainer.py``)."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    def __call__(self, model_fn, x, edge_index, target, **kwargs):
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        return Explanation(
            node_mask=jnp.asarray(self.rng.random(x.shape)),
            edge_mask=jnp.asarray(self.rng.random(coo.shape[1])),
            x=x, edge_index=coo, target=target)


class GNNExplainer(ExplainerAlgorithm):
    """Trains node-feature + edge masks to preserve the prediction
    under size/entropy regularisation (reference
    ``gnn_explainer.py:24``, coeffs ``:66``)."""

    coeffs = {
        'edge_size': 0.005,
        'edge_ent': 1.0,
        'node_feat_size': 1.0,
        'node_feat_ent': 0.1,
        'EPS': 1e-15,
    }

    def __init__(self, epochs: int = 100, lr: float = 0.01,
                 seed: int = 0, task_level: str = 'node'):
        self.epochs = epochs
        self.lr = lr
        self.seed = seed
        self.task_level = task_level

    def _init_masks(self, x, e, node_mask_type):
        n, f = x.shape
        rng = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(rng)
        # reference gnn_explainer.py:403-421: node std 0.1; edge std
        # gain('relu') * sqrt(2 / (2N)).
        if node_mask_type == 'object':
            feat = 0.1 * jax.random.normal(k1, (n, 1))
        elif node_mask_type == 'attributes':
            feat = 0.1 * jax.random.normal(k1, (n, f))
        elif node_mask_type == 'common_attributes':
            feat = 0.1 * jax.random.normal(k1, (1, f))
        else:
            raise ValueError(f"Invalid node mask type: {node_mask_type}")
        std = float(np.sqrt(2.0) * np.sqrt(2.0 / (2 * max(n, 1))))
        edge = std * jax.random.normal(k2, (e,))
        return feat, edge

    def __call__(self, model_fn: Callable, x: jnp.ndarray, edge_index,
                 target: jnp.ndarray, index: Optional[int] = None,
                 node_mask_type: str = 'attributes',
                 feat_mask_init: Optional[jnp.ndarray] = None,
                 edge_mask_init: Optional[jnp.ndarray] = None,
                 **kwargs) -> Explanation:
        """``model_fn(x, edge_weight) -> logits`` closes over params and
        the graph; masks are sigmoid-parameterised.

        ``feat_mask_init``/``edge_mask_init`` override the random init
        (used by the oracle parity tests to transplant the reference's
        initial masks)."""
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        e = coo.shape[1]
        feat_mask, edge_mask = self._init_masks(x, e, node_mask_type)
        if feat_mask_init is not None:
            feat_mask = jnp.asarray(feat_mask_init)
        if edge_mask_init is not None:
            edge_mask = jnp.asarray(edge_mask_init)
        params = {'feat': feat_mask, 'edge': edge_mask}
        tx = optax.adam(self.lr)
        opt = tx.init(params)
        c = self.coeffs

        def base_loss(p):
            em = jax.nn.sigmoid(p['edge'])
            fm = jax.nn.sigmoid(p['feat'])
            h = x * fm
            logits = model_fn(h, em)
            if self.task_level == 'node' and index is not None:
                logits = logits[index]
                tgt = target[index] if target.ndim else target
            else:
                logits = logits.reshape(-1, logits.shape[-1]).mean(0) \
                    if logits.ndim > 1 and self.task_level == 'graph' \
                    else logits
                tgt = target
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.take_along_axis(
                logp.reshape(1, -1),
                jnp.asarray(tgt).reshape(1, 1), axis=1).sum()

        def _reg(loss, raw, hard, size_c, reduction, ent_c):
            # reference gnn_explainer.py:543-556: size + entropy over
            # the hard-mask (grad != 0) entries only.
            m = jax.nn.sigmoid(raw)
            cnt = jnp.maximum(hard.sum(), 1)
            if reduction == 'sum':
                loss = loss + size_c * jnp.where(hard, m, 0.0).sum()
            else:
                loss = loss + size_c * jnp.where(hard, m, 0.0).sum() / cnt
            ent = -m * jnp.log(m + c['EPS']) \
                - (1 - m) * jnp.log(1 - m + c['EPS'])
            return loss + ent_c * jnp.where(hard, ent, 0.0).sum() / cnt

        def full_loss(p, hard_edge, hard_feat):
            loss = base_loss(p)
            loss = _reg(loss, p['edge'], hard_edge, c['edge_size'],
                        'sum', c['edge_ent'])
            loss = _reg(loss, p['feat'], hard_feat,
                        c['node_feat_size'], 'mean', c['node_feat_ent'])
            return loss

        # Epoch 0 (reference _train: hard masks are still None, so no
        # regularization); the gradients define the hard masks.
        @jax.jit
        def step0(params, opt):
            l, g = jax.value_and_grad(base_loss)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, g

        @jax.jit
        def step(params, opt, hard_edge, hard_feat):
            l, g = jax.value_and_grad(full_loss)(params, hard_edge,
                                                 hard_feat)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, l

        params, opt, g0 = step0(params, opt)
        hard_edge = g0['edge'] != 0.0
        hard_feat = g0['feat'] != 0.0
        for _ in range(1, self.epochs):
            params, opt, _ = step(params, opt, hard_edge, hard_feat)

        # reference base.py:97 _post_process_mask: zero out entries not
        # involved in message passing (grad == 0 at epoch 0).
        return Explanation(
            node_mask=jnp.where(hard_feat,
                                jax.nn.sigmoid(params['feat']), 0.0),
            edge_mask=jnp.where(hard_edge,
                                jax.nn.sigmoid(params['edge']), 0.0),
            x=x, edge_index=coo, target=target)


class AttentionExplainer(ExplainerAlgorithm):
    """Uses attention coefficients as edge attributions (reference
    ``attention_explainer.py``). ``model_fn`` must return
    ``(logits, alpha [E] or [E, H])``."""

    def __call__(self, model_fn, x, edge_index, target, **kwargs):
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        logits, alpha = model_fn(x)
        if alpha.ndim > 1:
            alpha = alpha.max(-1)
        return Explanation(edge_mask=alpha, x=x, edge_index=coo,
                           target=target, prediction=logits)


class PGExplainer(ExplainerAlgorithm):
    """Parameterized explainer (reference
    ``explain/algorithm/pg_explainer.py``): a small MLP over edge
    embeddings ``[z_src || z_dst (|| z_index)]`` is TRAINED across
    instances to emit edge masks; explanation is then a single forward
    pass. ``train_explainer`` runs the training phase; ``__call__``
    produces the mask."""

    coeffs = {
        'edge_size': 0.05,
        'edge_ent': 1.0,
        'temp': (5.0, 2.0),
        'bias': 0.01,
        'EPS': 1e-15,
    }

    def __init__(self, epochs: int = 30, lr: float = 0.003,
                 hidden: int = 64, seed: int = 0,
                 task_level: str = 'node'):
        self.epochs = epochs
        self.lr = lr
        self.hidden = hidden
        self.seed = seed
        self.task_level = task_level
        self.params = None

    def _mlp(self, p, feats):
        h = jnp.maximum(feats @ p['w1'] + p['b1'], 0)
        return (h @ p['w2'] + p['b2'])[:, 0]

    def _edge_feats(self, z, coo, index):
        n = z.shape[0]
        src = jnp.minimum(coo[0], n - 1)
        dst = jnp.minimum(coo[1], n - 1)
        parts = [z[src], z[dst]]
        if self.task_level == 'node' and index is not None:
            parts.append(jnp.broadcast_to(z[index][None, :],
                                          z[src].shape))
        return jnp.concatenate(parts, -1)

    def _temperature(self, epoch):
        t0, t1 = self.coeffs['temp']
        return t0 * (t1 / t0) ** (epoch / max(self.epochs, 1))

    def train_explainer(self, model_fn: Callable, embed_fn: Callable,
                        x, edge_index, target,
                        indices=None) -> float:
        """model_fn(x, edge_weight)->logits; embed_fn(x)->z node
        embeddings (the reference takes the model's last conv layer)."""
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        z = jax.lax.stop_gradient(embed_fn(x))
        fdim = self._edge_feats(z, coo,
                                0 if self.task_level == 'node'
                                else None).shape[-1]
        k = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(k)
        p = {'w1': jax.random.normal(k1, (fdim, self.hidden)) * 0.1,
             'b1': jnp.zeros(self.hidden),
             'w2': jax.random.normal(k2, (self.hidden, 1)) * 0.1,
             'b2': jnp.zeros(1)}
        tx = optax.adam(self.lr)
        opt = tx.init(p)
        c = self.coeffs
        if indices is None:
            indices = [None] if self.task_level == 'graph' else [0]

        def loss_one(p, idx, temp, key):
            feats = self._edge_feats(z, coo, idx)
            logits = self._mlp(p, feats)
            u = jax.random.uniform(key, logits.shape,
                                   minval=c['bias'],
                                   maxval=1 - c['bias'])
            gumbel = jnp.log(u) - jnp.log(1 - u)
            em = jax.nn.sigmoid((logits + gumbel) / temp)
            out = model_fn(x, em)
            if self.task_level == 'node' and idx is not None:
                out = out[idx]
                tgt = target[idx] if target.ndim else target
            else:
                tgt = target
            logp = jax.nn.log_softmax(out.reshape(-1), -1)
            ce = -logp[jnp.asarray(tgt).reshape(())]
            ent = -em * jnp.log(em + c['EPS']) \
                - (1 - em) * jnp.log(1 - em + c['EPS'])
            return ce + c['edge_size'] * em.mean() \
                + c['edge_ent'] * ent.mean()

        @jax.jit
        def step(p, opt, idx, temp, key):
            def f(p):
                return loss_one(p, idx, temp, key)
            l, g = jax.value_and_grad(f)(p)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(p, up), opt, l

        key = jax.random.PRNGKey(self.seed + 1)
        loss = 0.0
        for epoch in range(self.epochs):
            temp = self._temperature(epoch)
            for idx in indices:
                key, sub = jax.random.split(key)
                p, opt, loss = step(p, opt, idx, temp, sub)
        self.params = p
        self._embed_fn = embed_fn
        return float(loss)

    def __call__(self, model_fn: Callable, x, edge_index, target,
                 index: Optional[int] = None, **kwargs) -> Explanation:
        if self.params is None:
            raise RuntimeError("PGExplainer must be trained first via "
                               "'train_explainer(...)'")
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        z = self._embed_fn(x)
        logits = self._mlp(self.params, self._edge_feats(z, coo, index))
        return Explanation(edge_mask=jax.nn.sigmoid(logits), x=x,
                           edge_index=coo, target=target)


class GraphMaskExplainer(ExplainerAlgorithm):
    """Layer-wise gated masking (reference
    ``explain/algorithm/graphmask_explainer.py``, simplified to a
    single learned gate per edge per layer with the same sparsity
    objective): trains hard-concrete gates so messages can be replaced
    by a learned baseline without changing the prediction."""

    def __init__(self, num_layers: int = 1, epochs: int = 100,
                 lr: float = 0.01, penalty: float = 0.005,
                 seed: int = 0, task_level: str = 'node'):
        self.num_layers = num_layers
        self.epochs = epochs
        self.lr = lr
        self.penalty = penalty
        self.seed = seed
        self.task_level = task_level

    def __call__(self, model_fn: Callable, x, edge_index, target,
                 index: Optional[int] = None, **kwargs) -> Explanation:
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        e = coo.shape[1]
        k = jax.random.PRNGKey(self.seed)
        gates = 0.1 * jax.random.normal(k, (self.num_layers, e))
        tx = optax.adam(self.lr)
        params = {'g': gates}
        opt = tx.init(params)

        def loss_fn(p):
            em = jax.nn.sigmoid(p['g']).mean(0)   # combined layer gates
            out = model_fn(x, em)
            if self.task_level == 'node' and index is not None:
                out = out[index]
                tgt = target[index] if target.ndim else target
            else:
                tgt = target
            logp = jax.nn.log_softmax(out.reshape(-1), -1)
            ce = -logp[jnp.asarray(tgt).reshape(())]
            return ce + self.penalty * jax.nn.sigmoid(p['g']).sum()

        @jax.jit
        def step(params, opt):
            l, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, l

        for _ in range(self.epochs):
            params, opt, _ = step(params, opt)
        return Explanation(
            edge_mask=jax.nn.sigmoid(params['g']).mean(0),
            x=x, edge_index=coo, target=target)


class CaptumExplainer(ExplainerAlgorithm):
    """Gradient-attribution explainer (reference
    ``explain/algorithm/captum_explainer.py``). Captum itself is a
    torch-only ecosystem package, but its headline attribution methods
    are plain gradient transforms — reimplemented here JAX-native:

    * ``'Saliency'``            |d f / d input|
    * ``'InputXGradient'``      input * gradient
    * ``'IntegratedGradients'`` (input - 0) * mean of gradients along
      the straight path from the zero baseline (``n_steps`` points —
      captum's default Gauss-Legendre refinement is within the method's
      own error bar at 25+ steps)

    The attribution target is the predicted/supplied class logit;
    node attributions come from d/dx, edge attributions from the
    gradient w.r.t. an all-ones edge weight (same edge-mask convention
    the other algorithms use)."""

    SUPPORTED = ('Saliency', 'InputXGradient', 'IntegratedGradients')

    def __init__(self, attribution_method: str = 'IntegratedGradients',
                 n_steps: int = 25, **kwargs):
        name = getattr(attribution_method, '__name__',
                       attribution_method)
        if name not in self.SUPPORTED:
            raise ValueError(
                f"attribution_method '{name}' not supported "
                f"(choose from {self.SUPPORTED})")
        self.method = name
        self.n_steps = int(kwargs.get('n_steps', n_steps))

    def __call__(self, model_fn, x, edge_index, target,
                 index: Optional[int] = None, **kwargs) -> Explanation:
        coo = (edge_index.coo if hasattr(edge_index, 'coo')
               else edge_index)
        e = coo.shape[1]
        tgt = jnp.asarray(target)

        def scalar(h, ew):
            logits = model_fn(h, ew)
            if logits.ndim == 1:          # graph-level single output
                return logits[tgt] if tgt.ndim == 0 else logits.sum()
            if index is not None:
                t = tgt[index] if tgt.ndim else tgt
                return logits[index, t]
            # per-node attribution decomposes over the sum of each
            # node's target logit
            t = (tgt if tgt.ndim else
                 jnp.full((logits.shape[0],), tgt))
            return jnp.take_along_axis(
                logits, t.reshape(-1, 1), axis=1).sum()

        grad = jax.grad(scalar, argnums=(0, 1))
        ones = jnp.ones((e,), x.dtype)
        if self.method == 'Saliency':
            gx, gw = grad(x, ones)
            node_mask, edge_mask = jnp.abs(gx), jnp.abs(gw)
        elif self.method == 'InputXGradient':
            gx, gw = grad(x, ones)
            node_mask, edge_mask = x * gx, gw
        else:                             # IntegratedGradients
            def body(carry, alpha):
                ax, aw = carry
                gx, gw = grad(alpha * x, alpha * ones)
                return (ax + gx, aw + gw), None

            alphas = (jnp.arange(1, self.n_steps + 1, dtype=x.dtype)
                      / self.n_steps)
            (sx, sw), _ = jax.lax.scan(
                body, (jnp.zeros_like(x), jnp.zeros_like(ones)),
                alphas)
            node_mask = x * sx / self.n_steps
            edge_mask = sw / self.n_steps
        return Explanation(node_mask=node_mask, edge_mask=edge_mask,
                           x=x, edge_index=coo, target=target)
