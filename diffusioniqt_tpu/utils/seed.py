"""Seeding helpers (reference ``utils_mine.set_seed``, utils_mine.py:8-14).

JAX randomness is explicit-key based, so 'seeding' mostly means numpy (data
pipeline) and producing a root PRNG key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed numpy + python RNGs and return a root JAX key."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)
