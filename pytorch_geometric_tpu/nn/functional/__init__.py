"""Functional regularizers (reference ``torch_geometric/nn/functional/``).

Both losses come from "Improving Molecular Graph Neural Network
Explainability with Orthonormalization and Induced Sparsity"
(https://arxiv.org/abs/2105.04854). TPU-first formulation: the ragged
per-graph split of the reference (``bro.py:32-45`` pad_sequence loops)
becomes one static-shape ``to_dense_batch`` + batched matmul, and the
per-row Python loop of ``gini.py:21-26`` becomes a broadcasted pairwise
|w_i - w_j| reduction — both fully jittable.
"""

import jax.numpy as jnp

from ...utils.dense import to_dense_batch

__all__ = ['bro', 'gini']


def bro(x: jnp.ndarray, batch: jnp.ndarray, batch_size: int,
        max_num_nodes: int, p=2) -> jnp.ndarray:
    """Batch Representation Orthogonality penalty (reference
    ``nn/functional/bro.py``): mean over graphs of ``||H H^T - I||_p``
    where H holds the graph's node embeddings.

    ``batch_size``/``max_num_nodes`` are static (XLA shapes); padded
    slots contribute zero rows, so their only effect on ``H H^T - I``
    would be the -1 diagonal of pad rows — masked out below.
    """
    h, mask = to_dense_batch(x, batch, batch_size, max_num_nodes)
    gram = jnp.einsum('bnf,bmf->bnm', h, h)
    eye = jnp.eye(max_num_nodes, dtype=x.dtype)[None]
    diff = (gram - eye) * (mask[:, :, None] & mask[:, None, :])
    if p == 2 or p == 'fro':
        per_graph = jnp.sqrt((diff ** 2).sum((1, 2)) + 1e-12)
    else:
        per_graph = (jnp.abs(diff) ** p).sum((1, 2)) ** (1.0 / p)
    return per_graph.sum() / batch_size


def gini(w: jnp.ndarray) -> jnp.ndarray:
    """Gini sparsity coefficient in [0, 1], averaged over rows
    (reference ``nn/functional/gini.py``): for each row, the normalized
    mean absolute pairwise difference of its entries."""
    n = w.shape[-1]
    pair = jnp.abs(w[:, :, None] - w[:, None, :]).sum((-2, -1))
    denom = 2 * (n * n - n) * jnp.abs(w).mean(-1) + jnp.finfo(
        w.dtype if jnp.issubdtype(w.dtype, jnp.floating)
        else jnp.float32).eps
    return (pair / denom).mean()
