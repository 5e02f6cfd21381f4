"""PRBCD adversarial structure attack (defensive robustness evaluation).

Reference: ``torch_geometric/contrib/nn/models/rbcd_attack.py``
(Projected Randomized Block Coordinate Descent, Geisler et al.) — used
to EVALUATE GNN robustness by finding worst-case edge perturbations
within a budget. Gradient ascent on a relaxed edge-weight block with
projection onto the budget simplex, all jitted.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PRBCDAttack:
    """Evaluate robustness: find up to ``budget`` edge flips maximising
    the loss of ``model_fn(edge_weight_full) -> loss``.

    ``model_fn`` closes over params/features and takes per-candidate-edge
    weights in [0, 1] for a random candidate block.
    """

    def __init__(self, block_size: int = 1000, epochs: int = 50,
                 lr: float = 0.1, seed: int = 0):
        self.block_size = block_size
        self.epochs = epochs
        self.lr = lr
        self.seed = seed
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _project(w: jnp.ndarray, budget: int) -> jnp.ndarray:
        """Project onto {0 <= w <= 1, sum w <= budget} (bisection on the
        simplex shift; reference rbcd_attack.py:_project)."""
        over = jnp.clip(w, 0, 1).sum() > budget
        lo, hi = jnp.asarray(0.0), jnp.maximum(w.max(), 1.0)
        for _ in range(25):
            mu = (lo + hi) / 2
            s = jnp.clip(w - mu, 0, 1).sum()
            lo = jnp.where(s > budget, mu, lo)
            hi = jnp.where(s > budget, hi, mu)
        shifted = jnp.clip(w - (lo + hi) / 2, 0, 1)
        return jnp.where(over, shifted, jnp.clip(w, 0, 1))

    def attack(self, num_nodes: int, budget: int,
               loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
               ) -> Tuple[np.ndarray, np.ndarray]:
        """``loss_fn(cand_edges [2, B], w [B]) -> scalar`` (higher =
        more damage). Returns (flip_edges [2, budget], weights)."""
        cand = np.stack([
            self.rng.integers(0, num_nodes, self.block_size),
            self.rng.integers(0, num_nodes, self.block_size)])
        keep = cand[0] != cand[1]
        cand = cand[:, keep]
        cand_j = jnp.asarray(cand)
        w = jnp.full((cand.shape[1],), budget / cand.shape[1])

        grad_fn = jax.jit(jax.grad(lambda w: loss_fn(cand_j, w)))
        for _ in range(self.epochs):
            g = grad_fn(w)
            w = self._project(w + self.lr * g, budget)
        top = np.argsort(-np.asarray(w))[:budget]
        return cand[:, top], np.asarray(w)[top]


class GRBCDAttack(PRBCDAttack):
    """Greedy RBCD (reference ``contrib/nn/models/rbcd_attack.py:649``):
    instead of projected gradient descent over edge weights, greedily
    flip the top-gradient edges of each sampled block until the budget
    is spent."""

    def attack(self, model_fn, x, edge_index, labels, budget: int,
               idx_attack=None):
        import numpy as _np
        coo = _np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                          else edge_index)
        n = x.shape[0]
        rng = _np.random.default_rng(self.seed)
        flipped = []
        existing = set(map(tuple, coo.T.tolist()))
        cur = coo
        steps = max(1, budget)
        per_step = max(1, budget // steps)
        for _ in range(steps):
            if len(flipped) >= budget:
                break
            # sample a random block of candidate edges
            cand = _np.stack([rng.integers(0, n, self.block_size),
                              rng.integers(0, n, self.block_size)])
            keep = cand[0] != cand[1]
            cand = cand[:, keep]
            full = _np.concatenate([cur, cand], 1)
            w0 = jnp.concatenate([jnp.ones(cur.shape[1]),
                                  jnp.zeros(cand.shape[1])])

            def loss_fn(w):
                logits = model_fn(x, jnp.asarray(full), w)
                if idx_attack is not None:
                    logits = logits[jnp.asarray(idx_attack)]
                    tgt = jnp.asarray(labels)[jnp.asarray(idx_attack)]
                else:
                    tgt = jnp.asarray(labels)
                logp = jax.nn.log_softmax(logits, -1)
                return -jnp.take_along_axis(
                    logp, tgt[:, None], axis=1).mean()

            g = jax.grad(loss_fn)(w0)
            g_cand = _np.asarray(g[cur.shape[1]:])
            order = _np.argsort(-g_cand)   # raise loss most
            for k in order[:per_step]:
                pair = (int(cand[0, k]), int(cand[1, k]))
                if pair not in existing and len(flipped) < budget:
                    flipped.append(pair)
                    existing.add(pair)
            if flipped:
                cur = _np.concatenate(
                    [coo, _np.asarray(flipped).T], 1)
        pert = _np.asarray(flipped).T if flipped \
            else _np.zeros((2, 0), _np.int64)
        return _np.concatenate([coo, pert], 1), pert
