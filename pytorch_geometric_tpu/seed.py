"""Seeding helper (reference ``torch_geometric/seed.py:7``)."""

import random

import numpy as np


def seed_everything(seed: int) -> None:
    """Seed python + numpy RNGs. JAX randomness is explicit-key based;
    use ``jax.random.key(seed)`` for traced randomness."""
    random.seed(seed)
    np.random.seed(seed)
