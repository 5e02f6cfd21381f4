"""Knowledge-graph embedding models.

Reference: ``torch_geometric/nn/kge/{base,transe,distmult,complex,rotate}
.py`` — ``KGEModel`` base (``base.py:11``) with node + relation embedding
tables, per-triplet scoring, margin/BCE losses and host-side negative
sampling by head/tail corruption.
"""

from typing import Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np


class KGEModel(fnn.Module):
    """Base: embedding tables + ``score(head, rel, tail)``."""
    num_nodes: int
    num_relations: int
    hidden_channels: int
    sparse: bool = False

    def _tables(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        node = self.param('node_emb', fnn.initializers.normal(0.1),
                          (self.num_nodes, self.node_dim()))
        rel = self.param('rel_emb', fnn.initializers.normal(0.1),
                         (self.num_relations, self.rel_dim()))
        return node, rel

    def node_dim(self) -> int:
        return self.hidden_channels

    def rel_dim(self) -> int:
        return self.hidden_channels

    @fnn.compact
    def __call__(self, head_index: jnp.ndarray, rel_type: jnp.ndarray,
                 tail_index: jnp.ndarray) -> jnp.ndarray:
        node, rel = self._tables()
        return self.score(node[head_index], rel[rel_type],
                          node[tail_index])

    def score(self, h, r, t) -> jnp.ndarray:
        raise NotImplementedError

    @staticmethod
    def random_sample(rng: np.random.Generator, head, rel, tail,
                      num_nodes: int):
        """Corrupt half heads / half tails (reference ``base.py:
        random_sample``). Host-side."""
        head = np.array(head)
        tail = np.array(tail)
        num = len(head)
        corrupt = rng.integers(0, num_nodes, num)
        half = num // 2
        head2 = head.copy()
        tail2 = tail.copy()
        head2[:half] = corrupt[:half]
        tail2[half:] = corrupt[half:]
        return head2, np.array(rel), tail2

    @staticmethod
    def margin_loss(pos_score, neg_score, margin: float = 1.0):
        return jnp.maximum(margin - pos_score + neg_score, 0).mean()

    @staticmethod
    def bce_loss(pos_score, neg_score):
        pos = -jax.nn.log_sigmoid(pos_score).mean()
        neg = -jax.nn.log_sigmoid(-neg_score).mean()
        return (pos + neg) / 2


class TransE(KGEModel):
    """-||h + r - t|| (reference ``transe.py``)."""
    p_norm: float = 1.0
    margin: float = 1.0

    def score(self, h, r, t) -> jnp.ndarray:
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True),
                            1e-12)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                            1e-12)
        d = h + r - t
        if self.p_norm == 1.0:
            dist = jnp.abs(d).sum(-1)
        else:
            dist = jnp.sqrt((d * d).sum(-1) + 1e-12)
        return self.margin - dist


class DistMult(KGEModel):
    """<h, r, t> (reference ``distmult.py``)."""

    def score(self, h, r, t) -> jnp.ndarray:
        return (h * r * t).sum(-1)


class ComplEx(KGEModel):
    """Re(<h, r, conj(t)>) (reference ``complex.py``)."""

    def node_dim(self) -> int:
        return 2 * self.hidden_channels

    def rel_dim(self) -> int:
        return 2 * self.hidden_channels

    def score(self, h, r, t) -> jnp.ndarray:
        hr, hi = jnp.split(h, 2, -1)
        rr, ri = jnp.split(r, 2, -1)
        tr, ti = jnp.split(t, 2, -1)
        return ((hr * rr - hi * ri) * tr
                + (hr * ri + hi * rr) * ti).sum(-1)


class RotatE(KGEModel):
    """-||h . r - t|| with unit-modulus complex rotations
    (reference ``rotate.py``)."""
    margin: float = 1.0

    def node_dim(self) -> int:
        return 2 * self.hidden_channels

    def rel_dim(self) -> int:
        return self.hidden_channels

    def score(self, h, r, t) -> jnp.ndarray:
        hr, hi = jnp.split(h, 2, -1)
        tr, ti = jnp.split(t, 2, -1)
        theta = r
        rr, ri = jnp.cos(theta), jnp.sin(theta)
        # complex rotation h * r; distance is the GLOBAL L2 norm over
        # (feature, re/im) — reference rotate.py:80 vector_norm(dim=(1,2))
        xr = hr * rr - hi * ri
        xi = hr * ri + hi * rr
        d = jnp.sqrt(((xr - tr) ** 2 + (xi - ti) ** 2).sum(-1) + 1e-12)
        return self.margin - d
