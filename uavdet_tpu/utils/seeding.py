"""Seed discipline.

The reference calls ``seed_everything(211, workers=True)``
(reference train.py:63-64). JAX RNG is functional, so "seeding everything"
means deriving one root ``jax.random.key`` plus seeding numpy/python for the
host-side data pipeline.
"""

import random

import numpy as np
import jax


def seed_everything(seed: int):
    """Seed python/numpy and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)
