"""Deterministic seeding (reference: src/utils/seed.py:6-11).

JAX threads PRNG keys explicitly, so "seeding" here covers the host-side
libraries used by the data pipeline (python `random`, numpy) and produces
the root `jax.random` key for the run.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int) -> "jax.Array":  # noqa: F821 (lazy jax import)
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    import jax

    return jax.random.PRNGKey(seed)
