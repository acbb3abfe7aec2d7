"""Noise-view knobs (ops/noise.py): distribution pins + trainer wiring.

``noise_impl``/``noise_fused`` change the realised random stream (like
``rng_impl``), never the element distribution's moments or the
cross-view independence — these tests pin that contract; the perf A/B
and OA study run on hardware (scripts/ab_noise.py, hw_session).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmlpl_tpu.ops.noise import make_noiser, two_net_views
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

CFG = dict(num_classes=9, num_features=103, patch_size=20,
           labeled_batch=16, unlabeled_batch=16, num_unlabel=64,
           num_epochs=1)


def test_binom16_moments_and_lattice():
    noisy = make_noiser("binom16", 1.0)
    z = np.asarray(noisy(jax.random.key(0), jnp.zeros((200_000,))))
    assert abs(z.mean()) < 0.01
    assert abs(z.var() - 1.0) < 0.01
    assert np.abs(z).max() <= 4.0  # 17-level lattice spans +/-4 sigma
    # lattice: every value is a half-integer multiple of 0.5
    assert np.allclose(z * 2, np.round(z * 2))
    # skewness ~0 (symmetric binomial)
    assert abs((z ** 3).mean()) < 0.02


def test_binom16_respects_scale_and_dtype():
    noisy = make_noiser("binom16", 0.5)
    base = jnp.ones((1000,), jnp.bfloat16)
    z = np.asarray(noisy(jax.random.key(1), base), np.float32) - 1.0
    assert abs(float(np.var(z)) - 0.25) < 0.02
    assert noisy(jax.random.key(1), base).dtype == jnp.bfloat16


def test_unknown_impl_raises():
    with pytest.raises(ValueError, match="noise_impl"):
        make_noiser("uniform", 1.0)


def test_fused_views_distribution_and_independence():
    """Fused draws keep per-element N(0, scale^2) and independence
    ACROSS the four views (the property CMLPL's cross-net consistency
    relies on)."""
    noisy = make_noiser("normal", 0.5)
    xp_l = jnp.zeros((64, 4, 4, 3))
    x_l = jnp.zeros((64, 7))
    xp_u = jnp.zeros((96, 4, 4, 3))
    x_u = jnp.zeros((96, 7))
    vb, sb, ve, se = two_net_views(noisy, True, jax.random.key(2),
                                   xp_l, x_l, xp_u, x_u)
    assert vb.shape == ve.shape == (160, 4, 4, 3)
    assert sb.shape == se.shape == (160, 7)
    a, b = np.asarray(vb).ravel(), np.asarray(ve).ravel()
    assert abs(a.std() - 0.5) < 0.02 and abs(b.std() - 0.5) < 0.02
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.05  # nets B and E see independent views


def test_unfused_matches_reference_structure():
    """Default path = the reference's 8-draw structure: noise drawn
    per labeled/unlabeled tensor BEFORE concatenation, keys in
    train.py:157-184 order.  Pinned against a hand-rolled oracle so the
    two_net_views refactor cannot silently shift the default stream."""
    noisy = make_noiser("normal", 0.5)
    xp_l, x_l = jnp.zeros((4, 2, 2, 3)), jnp.zeros((4, 5))
    xp_u, x_u = jnp.zeros((6, 2, 2, 3)), jnp.zeros((6, 5))
    k = jax.random.key(3)
    got = two_net_views(noisy, False, k, xp_l, x_l, xp_u, x_u)
    nk = jax.random.split(k, 8)

    def n(key, a):
        return a + jax.random.normal(key, a.shape, a.dtype) * 0.5

    want = (jnp.concatenate([n(nk[0], xp_l), n(nk[1], xp_u)]),
            jnp.concatenate([n(nk[2], x_l), n(nk[3], x_u)]),
            jnp.concatenate([n(nk[4], xp_l), n(nk[5], xp_u)]),
            jnp.concatenate([n(nk[6], x_l), n(nk[7], x_u)]))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_ab_noise_variants_are_valid_config_knobs():
    """scripts/ab_noise.py's variant table must stay constructible
    CMLPLConfig knobs (the hw_session item runs unattended — a drifted
    field name should fail here, not on the chip)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "ab_noise.py")
    spec = importlib.util.spec_from_file_location("ab_noise", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for name, kw in mod.VARIANTS.items():
        cfg = CMLPLConfig(**kw)
        assert cfg.noise_impl in ("normal", "binom16"), name


@pytest.mark.parametrize("knobs", [dict(noise_fused=True),
                                   dict(noise_impl="binom16")])
def test_trainer_runs_with_knobs(tiny_scene, tiny_splits, knobs):
    """Each knob trains (finite metrics) and actually changes the
    stream (step loss differs from the default run; post-step params are
    NOT compared — Adam's first step is sign-like, so same-sign grads
    yield identical params whatever the noise draw)."""
    from cmlpl_tpu.data import SemiSupervisedSampler

    losses = []
    for kw in ({}, knobs):
        cfg = CMLPLConfig(n_pc=tiny_scene.n_pc, **CFG, **kw)
        t = CMLPLTrainer(cfg, donate=False)
        s = t.init_state(jax.random.key(0))
        sam = SemiSupervisedSampler(tiny_splits, tiny_scene.labels, 16, 16,
                                    num_unlabel=64)
        li, ly, ui = next(iter(sam.epoch()))
        s, m = t.train_step(s, tiny_scene, li, ly, ui, epoch=1,
                            batch_index=0)
        assert np.isfinite(float(m["total_loss"]))
        losses.append(float(m["total_loss"]))
    assert losses[0] != losses[1]
