"""GPSE — Graph Positional and Structural Encoder.

Reference: ``torch_geometric/nn/models/gpse.py:367`` (GPSE),
``:615`` (GPSENodeEncoder), ``gpse_process``/``precompute_GPSE`` and the
``AddGPSE`` transform (``transforms/add_gpse.py``).

The model maps RANDOM node features through a deep residual
ResGatedGraphConv stack and an MLP head; after (pre)training against
precomputed positional/structural encoding targets, the head outputs are
used as learned PSE embeddings (``data.pestat_GPSE``).

TPU design: virtual-node augmentation is replaced by a global mean
context vector added per layer (same information path, no graph
rewrite — keeps static shapes), and BatchNorm by LayerNorm.
"""

from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np


class GPSE(fnn.Module):
    """(reference ``gpse.py:367``)."""
    dim_in: int = 20
    dim_hidden: int = 128
    dim_out: int = 32
    num_layers: int = 8
    layers_post_mp: int = 2
    use_virtual_context: bool = True
    final_l2_norm: bool = True
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x, edge_index, edge_mask=None, node_mask=None,
                 deterministic: bool = True):
        from ..conv import ResGatedGraphConv
        n = x.shape[0]
        h = fnn.Dense(self.dim_hidden, name='encoder')(x)
        for i in range(self.num_layers):
            conv = ResGatedGraphConv(out_channels=self.dim_hidden,
                                     name=f'conv_{i}')
            delta = conv(h, edge_index, edge_mask=edge_mask)
            if self.use_virtual_context:
                # virtual-node context: masked global mean broadcast
                if node_mask is not None:
                    cnt = jnp.maximum(node_mask.sum(), 1)
                    ctx = jnp.where(node_mask[:, None], h, 0).sum(0) / cnt
                else:
                    ctx = h.mean(0)
                delta = delta + fnn.Dense(self.dim_hidden,
                                          name=f'vn_{i}')(ctx)[None, :]
            delta = fnn.LayerNorm(name=f'norm_{i}')(delta)
            h = h + fnn.relu(delta)          # skipsum stage
            if self.dropout > 0 and not deterministic:
                rng = self.make_rng('dropout')
                keep = 1.0 - self.dropout
                h = h * jax.random.bernoulli(rng, keep, h.shape) / keep
        h = h / jnp.maximum(
            jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        for i in range(self.layers_post_mp - 1):
            h = fnn.relu(fnn.Dense(self.dim_hidden, name=f'post_{i}')(h))
        out = fnn.Dense(self.dim_out, name='head')(h)
        if self.final_l2_norm:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out


class GPSENodeEncoder(fnn.Module):
    """Maps PSE encodings up (linear or relu-MLP, with raw batch-norm
    and before/after dropout) and concatenates onto ``x``
    (reference ``gpse.py:615``)."""
    dim_emb: int
    dim_pe_in: int
    dim_pe_out: int
    dim_in: Optional[int] = None
    expand_x: bool = False
    norm_type: Optional[str] = 'batchnorm'
    model_type: str = 'mlp'
    n_layers: int = 2
    dropout_be: float = 0.5
    dropout_ae: float = 0.2

    @fnn.compact
    def __call__(self, x, pos_enc, deterministic: bool = True,
                 training: bool = False):
        if self.dim_emb <= self.dim_pe_out:
            raise ValueError(
                "Desired GPSE dimension (dim_pe_out) must be smaller "
                "than the final node embedding dimension (dim_emb).")

        def drop(h, p, name):
            if p == 0.0 or deterministic:
                return h
            return fnn.Dropout(p, deterministic=False, name=name)(h)

        pe = drop(pos_enc, self.dropout_be, 'dropout_be')
        if self.norm_type == 'batchnorm':
            pe = fnn.BatchNorm(use_running_average=not training,
                               epsilon=1e-5, momentum=0.9,
                               name='raw_norm')(pe)
        if self.model_type == 'mlp':
            # reference layer stack: in -> 2*out -> ... -> out, relu each
            dims = ([self.dim_pe_out] if self.n_layers == 1 else
                    [2 * self.dim_pe_out] * (self.n_layers - 1)
                    + [self.dim_pe_out])
            for i, d in enumerate(dims):
                pe = fnn.relu(fnn.Dense(d, name=f'pe_encoder_{2 * i}')(pe))
        elif self.model_type == 'linear':
            pe = fnn.Dense(self.dim_pe_out, name='pe_encoder')(pe)
        else:
            raise ValueError(f"GPSENodeEncoder: Does not support "
                             f"'{self.model_type}' encoder model.")
        pe = drop(pe, self.dropout_ae, 'dropout_ae')
        if self.expand_x:
            x = fnn.Dense(self.dim_emb - self.dim_pe_out,
                          name='linear_x')(x)
        return jnp.concatenate([x, pe], -1)


def gpse_random_features(num_nodes: int, dim: int, seed: int = 0,
                         rand_type: str = 'NormalSE') -> np.ndarray:
    """Random input features (reference ``gpse_process`` rand_type)."""
    rng = np.random.default_rng(seed)
    if rand_type == 'UniformSE':
        return rng.uniform(size=(num_nodes, dim)).astype(np.float32)
    if rand_type == 'BernoulliSE':
        return (rng.random((num_nodes, dim)) < 0.5).astype(np.float32)
    return rng.normal(size=(num_nodes, dim)).astype(np.float32)


def precompute_gpse(model: GPSE, params, data, seed: int = 0,
                    rand_type: str = 'NormalSE'):
    """Attach ``pestat_GPSE`` to a Data object
    (reference ``precompute_GPSE``)."""
    n = data.num_nodes
    x = jnp.asarray(gpse_random_features(n, model.dim_in, seed, rand_type))
    data.pestat_GPSE = model.apply(params, x, data.edge_index)
    return data


class AddGPSE:
    """Transform appending GPSE encodings
    (reference ``transforms/add_gpse.py``)."""

    def __init__(self, model: GPSE, params, seed: int = 0,
                 rand_type: str = 'NormalSE'):
        self.model, self.params = model, params
        self.seed, self.rand_type = seed, rand_type

    def __call__(self, data):
        return precompute_gpse(self.model, self.params, data,
                               self.seed, self.rand_type)
