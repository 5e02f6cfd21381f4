"""Loss selection by task config (reference
``torch_geometric/graphgym/loss.py:compute_loss``)."""

import jax.numpy as jnp
import optax


def compute_loss(pred: jnp.ndarray, true: jnp.ndarray,
                 task: str = 'classification',
                 mask=None):
    """Returns (loss, normalized_pred) like the reference."""
    if task in ('classification', 'node', 'graph'):
        if pred.shape[-1] == 1 or pred.ndim == 1:
            logits = pred.reshape(-1)
            l = optax.sigmoid_binary_cross_entropy(
                logits, true.astype(jnp.float32).reshape(-1))
            out = jnp.stack([1 - jnp.sign(logits), logits], -1)
        else:
            l = optax.softmax_cross_entropy_with_integer_labels(
                pred, true.astype(jnp.int32))
            out = jnp.argmax(pred, -1)
    elif task in ('regression', 'mse'):
        l = (pred.reshape(true.shape) - true) ** 2
        out = pred
    elif task == 'mae':
        l = jnp.abs(pred.reshape(true.shape) - true)
        out = pred
    else:
        raise ValueError(f"Loss task '{task}' not supported")
    if mask is not None:
        m = mask.astype(jnp.float32)
        while m.ndim < l.ndim:
            m = m[..., None]
        return (l * m).sum() / jnp.maximum(m.sum(), 1), out
    return l.mean(), out
