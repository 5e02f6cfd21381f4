"""GAE / VGAE / ARGA / ARGVA (reference ``nn/models/autoencoder.py``).

Functional-style: the encoder is any flax module; decode/losses are pure
functions of embeddings, so everything composes under jit.
"""

from typing import Callable, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

EPS = 1e-15


class InnerProductDecoder:
    """sigma(z_i . z_j) (reference ``autoencoder.py:InnerProductDecoder``)."""

    @staticmethod
    def decode(z: jnp.ndarray, edge_index, sigmoid: bool = True
               ) -> jnp.ndarray:
        coo = edge_index.coo if hasattr(edge_index, 'coo') else edge_index
        value = (z[coo[0]] * z[coo[1]]).sum(-1)
        return jax.nn.sigmoid(value) if sigmoid else value

    @staticmethod
    def decode_all(z: jnp.ndarray, sigmoid: bool = True) -> jnp.ndarray:
        adj = z @ z.T
        return jax.nn.sigmoid(adj) if sigmoid else adj


class GAE(fnn.Module):
    """Graph autoencoder (reference ``autoencoder.py:GAE``)."""
    encoder: fnn.Module

    def __call__(self, *args, **kwargs):
        return self.encode(*args, **kwargs)

    def encode(self, *args, **kwargs):
        return self.encoder(*args, **kwargs)

    @staticmethod
    def decode(z, edge_index, sigmoid: bool = True):
        return InnerProductDecoder.decode(z, edge_index, sigmoid)

    @staticmethod
    def recon_loss(z: jnp.ndarray, pos_edge_index,
                   neg_edge_index) -> jnp.ndarray:
        """BCE over positive and (given) negative edges
        (reference ``autoencoder.py:recon_loss``; negatives must be
        pre-sampled on the host for static shapes). Computed with
        ``log_sigmoid`` on raw logits for numerical stability."""
        pos = InnerProductDecoder.decode(z, pos_edge_index,
                                         sigmoid=False)
        neg = InnerProductDecoder.decode(z, neg_edge_index,
                                         sigmoid=False)
        pos_loss = -jax.nn.log_sigmoid(pos).mean()
        neg_loss = -jax.nn.log_sigmoid(-neg).mean()
        return pos_loss + neg_loss


class VGAE(fnn.Module):
    """Variational GAE (reference ``autoencoder.py:VGAE``). The encoder
    must return ``(mu, logstd)``."""
    encoder: fnn.Module
    max_logstd: float = 10.0

    def __call__(self, rng, *args, **kwargs):
        mu, logstd = self.encoder(*args, **kwargs)
        logstd = jnp.clip(logstd, a_max=self.max_logstd)
        z = self.reparametrize(rng, mu, logstd)
        return z, mu, logstd

    @staticmethod
    def reparametrize(rng, mu, logstd):
        return mu + jax.random.normal(rng, mu.shape) * jnp.exp(logstd)

    @staticmethod
    def kl_loss(mu: jnp.ndarray, logstd: jnp.ndarray) -> jnp.ndarray:
        return -0.5 * jnp.mean(
            jnp.sum(1 + 2 * logstd - mu ** 2 - jnp.exp(logstd) ** 2,
                    axis=1))

    decode = staticmethod(InnerProductDecoder.decode)
    recon_loss = staticmethod(GAE.recon_loss)


class ARGA(fnn.Module):
    """Adversarially regularized GAE (reference ``autoencoder.py:ARGA``)."""
    encoder: fnn.Module
    discriminator: fnn.Module

    def __call__(self, *args, **kwargs):
        return self.encoder(*args, **kwargs)

    def discriminate(self, z):
        return self.discriminator(z)

    @staticmethod
    def recon_loss(z, pos_edge_index, neg_edge_index):
        return GAE.recon_loss(z, pos_edge_index, neg_edge_index)

    def reg_loss(self, z) -> jnp.ndarray:
        real = jax.nn.sigmoid(self.discriminate(z))
        return -jnp.log(real + EPS).mean()

    def discriminator_loss(self, rng, z) -> jnp.ndarray:
        real = jax.nn.sigmoid(self.discriminate(
            jax.random.normal(rng, z.shape)))
        fake = jax.nn.sigmoid(self.discriminate(
            jax.lax.stop_gradient(z)))
        return (-jnp.log(real + EPS).mean()
                - jnp.log(1 - fake + EPS).mean())


class ARGVA(ARGA):
    """Adversarially regularized VGAE (reference ``autoencoder.py:ARGVA``)."""

    def __call__(self, rng, *args, **kwargs):
        mu, logstd = self.encoder(*args, **kwargs)
        logstd = jnp.clip(logstd, a_max=10.0)
        z = VGAE.reparametrize(rng, mu, logstd)
        return z, mu, logstd

    kl_loss = staticmethod(VGAE.kl_loss)
