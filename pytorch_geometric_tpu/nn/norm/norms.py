"""Graph normalisation layers (reference ``torch_geometric/nn/norm/``).

All per-graph statistics run through XLA segment reductions with a static
``batch_size``; a ``mask`` marks valid (non-padded) node rows so padded
batches normalise identically to unpadded ones.
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ...ops import scatter


def _graph_stats(x, batch, batch_size, mask):
    """Per-graph mean and E[x^2] over nodes (masked)."""
    mean = scatter(x, batch, batch_size, 'mean', mask=mask)
    mean2 = scatter(x * x, batch, batch_size, 'mean', mask=mask)
    return mean, mean2


class BatchNorm(fnn.Module):
    """Batch norm over the node dimension
    (reference ``nn/norm/batch_norm.py:10``)."""
    in_channels: int = 0
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    @fnn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        return fnn.BatchNorm(use_running_average=not training,
                             epsilon=self.eps, momentum=1 - self.momentum,
                             use_bias=self.affine, use_scale=self.affine,
                             name='bn')(x)


class InstanceNorm(fnn.Module):
    """Per-graph instance norm (reference ``nn/norm/instance_norm.py``)."""
    in_channels: int = 0
    eps: float = 1e-5
    affine: bool = False

    @fnn.compact
    def __call__(self, x, batch=None, batch_size: int = 1,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if batch is None:
            batch = jnp.zeros((x.shape[0],), jnp.int32)
        mean, mean2 = _graph_stats(x, batch, batch_size, mask)
        var = jnp.maximum(mean2 - mean * mean, 0)
        out = (x - mean[batch]) * jax.lax.rsqrt(var[batch] + self.eps)
        if self.affine:
            w = self.param('weight', fnn.initializers.ones, (x.shape[-1],))
            b = self.param('bias', fnn.initializers.zeros, (x.shape[-1],))
            out = out * w + b
        return out


class LayerNorm(fnn.Module):
    """mode='graph': normalise over all nodes+channels of each graph;
    mode='node': per-node LN (reference ``nn/norm/layer_norm.py``)."""
    in_channels: int = 0
    eps: float = 1e-5
    affine: bool = True
    mode: str = 'graph'

    @fnn.compact
    def __call__(self, x, batch=None, batch_size: int = 1,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.mode == 'node':
            return fnn.LayerNorm(epsilon=self.eps, use_bias=self.affine,
                                 use_scale=self.affine, name='ln')(x)
        if batch is None:
            batch = jnp.zeros((x.shape[0],), jnp.int32)
        # stats over nodes AND channels per graph
        mean_c, mean2_c = _graph_stats(x, batch, batch_size, mask)
        mean = mean_c.mean(-1, keepdims=True)
        var = jnp.maximum(mean2_c.mean(-1, keepdims=True) - mean * mean, 0)
        out = (x - mean[batch]) * jax.lax.rsqrt(var[batch] + self.eps)
        if self.affine:
            w = self.param('weight', fnn.initializers.ones, (x.shape[-1],))
            b = self.param('bias', fnn.initializers.zeros, (x.shape[-1],))
            out = out * w + b
        return out


class GraphNorm(fnn.Module):
    """x' = w * (x - a * E[x]) / sqrt(Var[x - a*E[x]]) + b with learnable
    shift weight a (reference ``nn/norm/graph_norm.py``)."""
    in_channels: int = 0
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x, batch=None, batch_size: int = 1,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        f = x.shape[-1]
        if batch is None:
            batch = jnp.zeros((x.shape[0],), jnp.int32)
        alpha = self.param('mean_scale', fnn.initializers.ones, (f,))
        w = self.param('weight', fnn.initializers.ones, (f,))
        b = self.param('bias', fnn.initializers.zeros, (f,))
        mean = scatter(x, batch, batch_size, 'mean', mask=mask)
        shifted = x - alpha * mean[batch]
        var = scatter(shifted * shifted, batch, batch_size, 'mean', mask=mask)
        return w * shifted * jax.lax.rsqrt(var[batch] + self.eps) + b


class GraphSizeNorm(fnn.Module):
    """x / sqrt(|V_g|) (reference ``nn/norm/graph_size_norm.py``)."""

    def __call__(self, x, batch=None, batch_size: int = 1,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if batch is None:
            batch = jnp.zeros((x.shape[0],), jnp.int32)
        ones = jnp.ones((x.shape[0],), x.dtype)
        deg = scatter(ones, batch, batch_size, 'sum', mask=mask)
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
        return x * inv_sqrt[batch][:, None]


class PairNorm(fnn.Module):
    """Center + rescale to constant total pairwise distance
    (reference ``nn/norm/pair_norm.py``). modes: 'PN', 'PN-SI', 'PN-SCS'."""
    scale: float = 1.0
    scale_individually: bool = False
    eps: float = 1e-5

    def __call__(self, x, batch=None, batch_size: int = 1,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if batch is None:
            batch = jnp.zeros((x.shape[0],), jnp.int32)
        mean = scatter(x, batch, batch_size, 'mean', mask=mask)
        xc = x - mean[batch]
        if self.scale_individually:  # PN-SI
            norm = jnp.sqrt((xc * xc).sum(-1, keepdims=True) + self.eps)
            return self.scale * xc / norm
        msq = scatter((xc * xc).sum(-1), batch, batch_size, 'mean', mask=mask)
        return self.scale * xc * jax.lax.rsqrt(msq + self.eps)[batch][:, None]


class MeanSubtractionNorm(fnn.Module):
    """x - mean (reference ``nn/norm/mean_subtraction_norm.py``)."""

    def __call__(self, x, batch=None, batch_size: int = 1,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if batch is None:
            if mask is not None:
                m = mask[:, None]
                mean = (x * m).sum(0) / jnp.maximum(m.sum(), 1)
            else:
                mean = x.mean(0)
            return x - mean
        mean = scatter(x, batch, batch_size, 'mean', mask=mask)
        return x - mean[batch]


class MsgNorm(fnn.Module):
    """x + s * ||x||_2 * msg / ||msg||_2 (reference ``nn/norm/msg_norm.py``,
    used by GENConv/DeeperGCN)."""
    learn_scale: bool = False

    @fnn.compact
    def __call__(self, x: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
        if self.learn_scale:
            s = self.param('scale', fnn.initializers.ones, (1,))
        else:
            s = 1.0
        msg_n = msg * jax.lax.rsqrt(
            jnp.maximum((msg * msg).sum(-1, keepdims=True), 1e-12))
        x_norm = jnp.sqrt((x * x).sum(-1, keepdims=True))
        return msg_n * x_norm * s


class DiffGroupNorm(fnn.Module):
    """Group-wise BN with soft cluster assignment
    (reference ``nn/norm/diff_group_norm.py``)."""
    in_channels: int = 0
    groups: int = 4
    lamda: float = 0.01
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        f = x.shape[-1]
        s = jax.nn.softmax(fnn.Dense(self.groups, name='lin')(x), axis=-1)
        out = jnp.zeros_like(x)
        for g in range(self.groups):
            h = s[:, g:g + 1] * x
            h = fnn.BatchNorm(use_running_average=not training,
                              epsilon=self.eps, name=f'norm_{g}')(h)
            out = out + s[:, g:g + 1] * h
        return x + self.lamda * out


class HeteroBatchNorm(fnn.Module):
    """Per-type batch norm over a flat node tensor + type vector
    (reference ``nn/norm/batch_norm.py:97``)."""
    in_channels: int = 0
    num_types: int = 1
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x: jnp.ndarray, type_vec: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        # Per-type statistics computed as segment reductions over types.
        mean = scatter(x, type_vec, self.num_types, 'mean')
        mean2 = scatter(x * x, type_vec, self.num_types, 'mean')
        var = jnp.maximum(mean2 - mean * mean, 0)
        w = self.param('weight', fnn.initializers.ones,
                       (self.num_types, x.shape[-1]))
        b = self.param('bias', fnn.initializers.zeros,
                       (self.num_types, x.shape[-1]))
        out = (x - mean[type_vec]) * jax.lax.rsqrt(var[type_vec] + self.eps)
        return out * w[type_vec] + b[type_vec]


class HeteroLayerNorm(fnn.Module):
    """Per-type affine layer norm (reference ``nn/norm/layer_norm.py``
    HeteroLayerNorm)."""
    in_channels: int = 0
    num_types: int = 1
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x: jnp.ndarray, type_vec: jnp.ndarray) -> jnp.ndarray:
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps)
        w = self.param('weight', fnn.initializers.ones,
                       (self.num_types, x.shape[-1]))
        b = self.param('bias', fnn.initializers.zeros,
                       (self.num_types, x.shape[-1]))
        return out * w[type_vec] + b[type_vec]
