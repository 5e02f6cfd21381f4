"""GLEM — variational EM co-training of a language model and a GNN.

Reference: ``torch_geometric/llm/models/glem.py:18``. GLEM alternates:
E-step trains the LM on gold labels plus GNN pseudo-labels; M-step
trains the GNN on gold labels plus LM pseudo-labels; each step mixes the
two losses with ``pl_weight``.

TPU design: the GNN side is a pure-JAX jitted train step; the text model
is abstracted as a callable ``lm_logits_fn(node_ids) -> [B, C]`` so any
encoder (our ``llm.models.LLM`` wrapper, a SentenceTransformer + linear
probe, or precomputed embeddings) plugs in without coupling the EM loop
to torch.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def glem_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              pseudo_labels: jnp.ndarray, is_gold: jnp.ndarray,
              pl_weight: float = 0.5,
              is_augmented: bool = True) -> jnp.ndarray:
    """Mixed gold/pseudo cross-entropy (reference ``glem.py:378``)."""
    ce = optax.softmax_cross_entropy_with_integer_labels
    if not is_augmented:
        return ce(logits, labels).mean()
    gold = is_gold.astype(jnp.float32)
    n_gold = jnp.maximum(gold.sum(), 1)
    n_pl = jnp.maximum((1 - gold).sum(), 1)
    mle = (ce(logits, labels) * gold).sum() / n_gold
    pl = (ce(logits, pseudo_labels) * (1 - gold)).sum() / n_pl
    has_pl = (1 - gold).sum() > 0
    return jnp.where(has_pl, pl_weight * pl + (1 - pl_weight) * mle,
                     ce(logits, labels).mean())


class GLEM:
    """EM orchestration (reference ``glem.py:18``).

    gnn: a flax module mapping ``(x, edge_index) -> logits``;
    lm_logits_fn: callable ``(node_ids) -> logits`` for the text model
    (already trained / finetuned externally per E-step);
    lm_update_fn: optional callable ``(node_ids, targets, is_gold)``
    invoked during the E-step to finetune the text model.
    """

    def __init__(self, gnn, gnn_params, lm_logits_fn: Callable,
                 lm_update_fn: Optional[Callable] = None,
                 pl_weight: float = 0.5, lr: float = 1e-3):
        self.gnn = gnn
        self.gnn_params = gnn_params
        self.lm_logits_fn = lm_logits_fn
        self.lm_update_fn = lm_update_fn
        self.pl_weight = pl_weight
        self.tx = optax.adam(lr)
        self.opt = self.tx.init(gnn_params)

        def _step(params, opt, x, ei, labels, pseudo, is_gold):
            def lf(p):
                logits = self.gnn.apply(p, x, ei)
                return glem_loss(logits, labels, pseudo, is_gold,
                                 self.pl_weight)
            loss, g = jax.value_and_grad(lf)(params)
            up, opt = self.tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss
        self._step = jax.jit(_step)

    # -- M-step: GNN on gold + LM pseudo labels (reference train_gnn) ---
    def train_gnn(self, x, edge_index, labels, is_gold,
                  num_steps: int = 1) -> float:
        node_ids = jnp.arange(x.shape[0])
        lm_pseudo = jnp.argmax(self.lm_logits_fn(node_ids), -1)
        loss = None
        for _ in range(num_steps):
            self.gnn_params, self.opt, loss = self._step(
                self.gnn_params, self.opt, x, edge_index, labels,
                lm_pseudo, is_gold)
        return float(loss)

    # -- E-step: LM on gold + GNN pseudo labels (reference train_lm) ----
    def train_lm(self, x, edge_index, labels, is_gold) -> None:
        if self.lm_update_fn is None:
            return
        gnn_logits = self.gnn.apply(self.gnn_params, x, edge_index)
        pseudo = jnp.argmax(gnn_logits, -1)
        targets = jnp.where(is_gold, labels, pseudo)
        self.lm_update_fn(jnp.arange(x.shape[0]), targets, is_gold)

    def em_round(self, x, edge_index, labels, is_gold,
                 gnn_steps: int = 10) -> float:
        """One full EM iteration: E (LM) then M (GNN)."""
        self.train_lm(x, edge_index, labels, is_gold)
        return self.train_gnn(x, edge_index, labels, is_gold, gnn_steps)

    def inference_gnn(self, x, edge_index) -> jnp.ndarray:
        return self.gnn.apply(self.gnn_params, x, edge_index)

    def inference(self, em_phase: str, x, edge_index) -> jnp.ndarray:
        if em_phase == 'lm':
            return self.lm_logits_fn(jnp.arange(x.shape[0]))
        return self.inference_gnn(x, edge_index)
