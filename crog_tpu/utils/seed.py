"""Seeding.

The reference broadcast a random seed across ranks (utils/misc.py:15-43) to
keep DDP processes in lock-step.  In JAX the train step derives all randomness
from an explicit PRNG key threaded through the step function, so every host
computes identical keys by construction; this module just provides the root
key and per-step folding helpers.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs (data augmentation order, python shuffles) and
    return the root device PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def step_key(root_key: jax.Array, step: int) -> jax.Array:
    """Deterministic per-step key (replaces per-rank torch generator state)."""
    return jax.random.fold_in(root_key, step)
