"""Criterion factory, validation reporter, and memory-bank contrastive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmlpl_tpu.objectives import (
    cross_entropy,
    get_criterion,
    memobank_contrastive,
    memobank_init,
    weighted_cross_entropy,
)


def test_get_criterion_plain_ce(rng):
    logits = jnp.asarray(rng.normal(size=(16, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=16))
    crit = get_criterion({"criterion": {"type": "ce"},
                          "dataset": {"ignore_label": -1}})
    assert float(crit(logits, labels)) == pytest.approx(
        float(cross_entropy(logits, labels)), rel=1e-6)


def test_get_criterion_ohem_and_aux(rng):
    logits = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    aux = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=32))
    crit = get_criterion({
        "criterion": {"type": "ohem",
                      "kwargs": {"thresh": 0.7, "min_kept": 8}},
        "dataset": {"ignore_label": -1},
        "net": {"aux_loss": {"loss_weight": 0.4}}})
    v = float(crit((logits, aux), labels))
    assert np.isfinite(v) and v > 0


def test_weighted_ce_reweights(rng):
    logits = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=64))
    flat = float(weighted_cross_entropy(logits, labels,
                                        jnp.ones(3)))
    assert flat == pytest.approx(float(cross_entropy(logits, labels)),
                                 rel=1e-5)
    skew = float(weighted_cross_entropy(logits, labels,
                                        jnp.asarray([10.0, 0.01, 0.01])))
    assert skew != pytest.approx(flat, rel=1e-3)


def test_get_criterion_use_weight_requires_weights():
    with pytest.raises(ValueError):
        get_criterion({"criterion": {"type": "ce",
                                     "kwargs": {"use_weight": True}},
                       "dataset": {"ignore_label": -1}})


def test_memobank_contrastive_runs_and_updates(rng):
    n, d, c = 64, 16, 5
    rep = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rep_t = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    probs = jnp.asarray(rng.dirichlet(np.ones(c), size=n).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, size=n))
    low = jnp.asarray(rng.random(n) > 0.3)
    high = jnp.asarray(rng.random(n) > 0.3)
    bank = memobank_init(c, 128, d)
    loss, bank2 = memobank_contrastive(
        rep, rep_t, probs, labels, low, high, bank, jax.random.key(0),
        num_queries=16, num_negatives=8)
    assert np.isfinite(float(loss))
    assert int(jnp.sum(bank2.count)) > 0
    # second call with warm bank produces a positive loss
    loss2, _ = memobank_contrastive(
        rep, rep_t, probs, labels, low, high, bank2, jax.random.key(1),
        num_queries=16, num_negatives=8)
    assert float(loss2) > 0


def test_validation_accuracy(tiny_scene, tiny_splits):
    import jax.numpy as jnp
    from cmlpl_tpu.eval import validation_accuracy
    from cmlpl_tpu.models import BaseNet2

    model = BaseNet2(num_features=103, num_classes=9, n_pc=tiny_scene.n_pc)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 20, 20, tiny_scene.n_pc)),
                        jnp.zeros((1, 103)), train=False)["params"]

    def apply(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    oa, aa, per_class = validation_accuracy(
        apply, params, tiny_scene, tiny_splits.test, patch_size=20,
        num_classes=9, verbose=False)
    assert 0.0 <= oa <= 1.0
    assert per_class.shape == (9,)


def test_memobank_ema_prototypes(rng):
    n, d, c = 32, 8, 4
    rep = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    rep_t = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    probs = jnp.asarray(rng.dirichlet(np.ones(c), size=n).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, size=n))
    low = jnp.ones(n, bool)
    high = jnp.ones(n, bool)
    bank = memobank_init(c, 64, d)
    protos = jnp.zeros((c, d))
    loss, bank, protos = memobank_contrastive(
        rep, rep_t, probs, labels, low, high, bank, jax.random.key(0),
        num_queries=8, num_negatives=4, momentum_prototypes=protos,
        i_iter=1)
    assert np.isfinite(float(loss))
    assert float(jnp.sum(jnp.abs(protos))) > 0  # prototypes now warm
    # second call with new teacher features: EMA blend pulls prototypes
    # halfway (decay = 1 - 1/2) between batch mean and running state
    rep_t2 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    loss2, bank, protos2 = memobank_contrastive(
        rep, rep_t2, probs, labels, low, high, bank, jax.random.key(1),
        num_queries=8, num_negatives=4, momentum_prototypes=protos,
        i_iter=2)
    assert np.all(np.isfinite(np.asarray(protos2)))
    assert not np.allclose(np.asarray(protos2), np.asarray(protos))
