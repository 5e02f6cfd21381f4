"""PGMExplainer — perturbation-based probabilistic explanations.

Reference: ``torch_geometric/contrib/explain/pgm_explainer.py:15``.
Randomly perturbs node features over many samples, records which
perturbations flip the prediction, and chi-squared-tests each node's
influence; the explanation is the per-node p-value vector.
"""

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..explain.explanation import Explanation


class PGMExplainer:
    """(reference ``pgm_explainer.py:15``)."""

    def __init__(self, feature_index: Optional[List[int]] = None,
                 perturbation_mode: str = 'randint',
                 num_samples: int = 100,
                 significance_threshold: float = 0.05,
                 pred_threshold: float = 0.1, seed: int = 0):
        self.feature_index = feature_index
        self.perturbation_mode = perturbation_mode
        self.num_samples = num_samples
        self.significance_threshold = significance_threshold
        self.pred_threshold = pred_threshold
        self.rng = np.random.default_rng(seed)

    def _perturb(self, x: np.ndarray, nodes: np.ndarray) -> np.ndarray:
        out = x.copy()
        cols = (self.feature_index if self.feature_index is not None
                else range(x.shape[1]))
        for v in nodes:
            for c in cols:
                if self.perturbation_mode == 'zero':
                    out[v, c] = 0
                elif self.perturbation_mode == 'mean':
                    out[v, c] = x[:, c].mean()
                elif self.perturbation_mode == 'max':
                    out[v, c] = x[:, c].max()
                elif self.perturbation_mode == 'uniform':
                    out[v, c] = self.rng.uniform(x[:, c].min(),
                                                 x[:, c].max())
                else:   # randint: random other row's value
                    out[v, c] = x[self.rng.integers(0, x.shape[0]), c]
        return out

    def __call__(self, model_fn: Callable, x, edge_index, target,
                 index: Optional[int] = None, **kwargs) -> Explanation:
        from scipy.stats import chi2_contingency
        coo = np.asarray(edge_index.coo if hasattr(edge_index, 'coo')
                         else edge_index)
        x = np.asarray(x)
        n = x.shape[0]
        base = np.asarray(model_fn(jnp.asarray(x)))
        if index is not None:
            base_prob = jax.nn.softmax(jnp.asarray(base[index]))
            base_pred = int(np.argmax(base[index]))
        else:
            base_prob = jax.nn.softmax(jnp.asarray(base).mean(0))
            base_pred = int(np.argmax(np.asarray(base).mean(0)))

        perturbed = np.zeros((self.num_samples, n), bool)
        changed = np.zeros(self.num_samples, bool)
        for s in range(self.num_samples):
            mask = self.rng.random(n) < 0.5
            perturbed[s] = mask
            xs = self._perturb(x, np.nonzero(mask)[0])
            out = np.asarray(model_fn(jnp.asarray(xs)))
            row = out[index] if index is not None else out.mean(0)
            p = np.asarray(jax.nn.softmax(jnp.asarray(row)))
            changed[s] = (p[base_pred]
                          < float(base_prob[base_pred])
                          - self.pred_threshold)

        pvals = np.ones(n)
        for v in range(n):
            table = np.zeros((2, 2))
            for s in range(self.num_samples):
                table[int(perturbed[s, v]), int(changed[s])] += 1
            if table.sum(1).min() > 0 and table.sum(0).min() > 0:
                try:
                    _, pv, _, _ = chi2_contingency(table + 1e-9)
                    pvals[v] = pv
                except ValueError:
                    pass
        node_mask = (pvals < self.significance_threshold)
        exp = Explanation(node_mask=jnp.asarray(node_mask
                                                .astype(np.float32)),
                          x=jnp.asarray(x), edge_index=jnp.asarray(coo),
                          target=target)
        exp.extras['pgm_stats'] = jnp.asarray(pvals)
        return exp
