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

    def __call__(self, model_fn: Callable, x: jnp.ndarray, edge_index,
                 target: jnp.ndarray,
                 index: Optional[int] = None, **kwargs) -> Explanation:
        """``model_fn(x, edge_weight) -> logits`` closes over params and
        the graph; masks are sigmoid-parameterised."""
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        e = coo.shape[1]
        rng = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(rng)
        # reference init: N(1, 0.1) node feat, scaled normal edges
        feat_mask = 0.1 * jax.random.normal(k1, (1, x.shape[1]))
        std = float(np.sqrt(2.0 / (2 * max(x.shape[0], 2))))
        edge_mask = std * jax.random.normal(k2, (e,))
        params = {'feat': feat_mask, 'edge': edge_mask}
        tx = optax.adam(self.lr)
        opt = tx.init(params)
        c = self.coeffs

        def loss_fn(p):
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
            ce = -jnp.take_along_axis(
                logp.reshape(1, -1),
                jnp.asarray(tgt).reshape(1, 1), axis=1).sum()
            loss = ce
            loss = loss + c['edge_size'] * em.sum()
            ent = -em * jnp.log(em + c['EPS']) \
                - (1 - em) * jnp.log(1 - em + c['EPS'])
            loss = loss + c['edge_ent'] * ent.mean()
            loss = loss + c['node_feat_size'] * fm.mean()
            fent = -fm * jnp.log(fm + c['EPS']) \
                - (1 - fm) * jnp.log(1 - fm + c['EPS'])
            loss = loss + c['node_feat_ent'] * fent.mean()
            return loss

        @jax.jit
        def step(params, opt):
            l, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, l

        for _ in range(self.epochs):
            params, opt, _ = step(params, opt)

        return Explanation(
            node_mask=jax.nn.sigmoid(params['feat']),
            edge_mask=jax.nn.sigmoid(params['edge']),
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
