"""PRNG plumbing.

The reference pins global seeds everywhere (``train.py:50-58`` seed_torch,
``train.py:44-47`` worker seeding).  JAX threads explicit PRNG keys instead;
this module provides the one global entry point (numpy seeding for the
host-side split generation, which must stay byte-identical to the reference,
plus a root ``jax.random.key``).
"""

from __future__ import annotations

import random

import jax
import numpy as np

DEFAULT_SEED = 1088  # reference train.py:50


def seed_everything(seed: int = DEFAULT_SEED,
                    impl: str | None = None) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key.

    Equivalent in intent to ``seed_torch(1088)`` (reference train.py:50-58);
    device-side randomness is fully determined by the returned key.
    ``impl``: PRNG implementation ("threefry2x32" default; "rbg" is much
    faster on TPU — the impl travels with the key through all splits).
    """
    random.seed(seed)
    np.random.seed(seed)
    if impl and impl != "threefry2x32":
        return jax.random.key(seed, impl=impl)
    return jax.random.key(seed)
