"""Patch augmentation capabilities (reference hsi_loader.py:58-107)."""

import jax
import jax.numpy as jnp
import numpy as np

from cmlpl_tpu.data.augment import (
    mixture_noise,
    radiation_noise,
    random_flip,
    random_rot90,
)


def test_random_flip_is_a_flip(rng):
    x = jnp.asarray(rng.normal(size=(16, 6, 6, 3)), jnp.float32)
    out = np.asarray(random_flip(jax.random.key(0), x))
    xn = np.asarray(x)
    for i in range(16):
        candidates = [xn[i], xn[i, ::-1], xn[i, :, ::-1], xn[i, ::-1, ::-1]]
        assert any(np.allclose(out[i], c) for c in candidates)


def test_random_rot90_is_a_rotation(rng):
    x = jnp.asarray(rng.normal(size=(8, 5, 5, 2)), jnp.float32)
    out = np.asarray(random_rot90(jax.random.key(1), x))
    xn = np.asarray(x)
    for i in range(8):
        cands = [np.rot90(xn[i], k, axes=(0, 1)) for k in range(4)]
        assert any(np.allclose(out[i], c) for c in cands)


def test_radiation_noise_stats(rng):
    x = jnp.ones((4, 8, 8, 2), jnp.float32) * 10.0
    out = np.asarray(radiation_noise(jax.random.key(2), x))
    # alpha in [0.9, 1.1], beta noise small -> output near 10
    assert np.all(out > 8.0) and np.all(out < 12.0)


def test_mixture_noise_same_class_blend(rng):
    x = jnp.asarray(rng.normal(size=(10, 4, 4, 2)), jnp.float32)
    labels = jnp.asarray([0, 0, 0, 0, 0, 1, 1, 1, 1, 1])
    out = mixture_noise(jax.random.key(3), x, labels, beta=0.0)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
