"""Patch-level augmentations (reference ``hsi_loader.py:58-107``).

The reference defines these as dataset static methods but never wires them
into ``__getitem__`` (dead code), and ``mixture_noise`` references undefined
attributes (``self.ignored_labels``) — broken as shipped.  Here they are
live, jit-compatible capabilities operating on (B, w, w, C) batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_flip(rng: jax.Array, xp: jax.Array) -> jax.Array:
    """Independent horizontal/vertical flips (hsi_loader.py:58-68),
    per batch element."""
    kh, kv = jax.random.split(rng)
    b = xp.shape[0]
    do_h = jax.random.bernoulli(kh, 0.5, (b,))
    do_v = jax.random.bernoulli(kv, 0.5, (b,))
    flipped_h = jnp.flip(xp, axis=2)
    xp = jnp.where(do_h[:, None, None, None], flipped_h, xp)
    flipped_v = jnp.flip(xp, axis=1)
    return jnp.where(do_v[:, None, None, None], flipped_v, xp)


def random_rot90(rng: jax.Array, xp: jax.Array) -> jax.Array:
    """Uniform k*90-degree rotation per element (hsi_loader.py:70-88)."""
    b = xp.shape[0]
    k = jax.random.randint(rng, (b,), 0, 4)
    rots = jnp.stack([xp,
                      jnp.rot90(xp, 1, axes=(1, 2)),
                      jnp.rot90(xp, 2, axes=(1, 2)),
                      jnp.rot90(xp, 3, axes=(1, 2))], axis=0)
    return rots[k, jnp.arange(b)]


def radiation_noise(rng: jax.Array, x: jax.Array,
                    alpha_range=(0.9, 1.1), beta: float = 1.0 / 25
                    ) -> jax.Array:
    """alpha * x + beta * N(0,1) with per-batch alpha
    (hsi_loader.py:90-94)."""
    ka, kn = jax.random.split(rng)
    alpha = jax.random.uniform(ka, (x.shape[0],) + (1,) * (x.ndim - 1),
                               minval=alpha_range[0], maxval=alpha_range[1])
    return alpha * x + beta * jax.random.normal(kn, x.shape, x.dtype)


def mixture_noise(rng: jax.Array, x: jax.Array, labels: jax.Array,
                  beta: float = 1.0 / 25) -> jax.Array:
    """Blend each sample with another sample of the same class plus noise
    (re-derivation of the broken hsi_loader.py:96-107): for each element,
    pick a same-class partner from the batch, mix with random positive
    weights, add Gaussian noise."""
    b = x.shape[0]
    ka, kp, kn = jax.random.split(rng, 3)
    a1, a2 = jax.random.uniform(ka, (2, b), minval=0.01, maxval=1.0)
    same = labels[:, None] == labels[None, :]
    # sample a same-class partner index per row (self allowed, which the
    # reference also permits)
    logits = jnp.where(same, 0.0, -1e30)
    partner = jax.random.categorical(kp, logits, axis=1)
    x2 = x[partner]
    shape = (b,) + (1,) * (x.ndim - 1)
    a1 = a1.reshape(shape)
    a2 = a2.reshape(shape)
    mixed = (a1 * x + a2 * x2) / (a1 + a2)
    return mixed + beta * jax.random.normal(kn, x.shape, x.dtype)
