"""Comparison-model zoo: shape and registry coverage (reference
tools/conpared_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmlpl_tpu.models import (
    ZOO,
    build_model,
    mish,
    spa_randomization,
    spe_randomization,
    weight_ema,
)
from cmlpl_tpu.registry import get_dataset


@pytest.mark.parametrize("name", sorted(ZOO.keys()))
def test_zoo_model_forward(name):
    spec = get_dataset(1)  # PaviaU: 103 bands, 9 classes
    entry = ZOO[name]
    w = entry.default_patch
    n_pc = spec.num_bands if entry.default_n_pc == -1 \
        else entry.default_n_pc
    model, entry = build_model(name, spec, n_pc)
    xp = jnp.ones((2, w, w, n_pc))
    x = jnp.ones((2, spec.num_bands))
    rng = jax.random.key(0)
    if entry.inputs == "dual":
        variables = model.init(rng, xp, x, train=False)
        out = model.apply(variables, xp, x, train=False)
    else:
        variables = model.init(rng, xp, train=False)
        out = model.apply(variables, xp, train=False)
    logits = out[0] if entry.returns_feature else out
    assert logits.shape == (2, spec.num_classes)
    assert np.all(np.isfinite(np.asarray(logits)))
    if entry.returns_feature:
        assert out[1].shape[0] == 2


def test_zoo_covers_survey_inventory():
    # SURVEY §2.3 component list
    for required in ["ssftt", "basenet1", "basenet2_zoo", "dbda",
                     "dbda_feature", "ssrn", "fdssc", "msvit"]:
        assert required in ZOO


def test_weight_ema_matches_reference_formula():
    base = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(3.0)}
    ema = {"w": jnp.asarray([0.0, 0.0]), "b": jnp.asarray(1.0)}
    out = weight_ema(base, ema, alpha=0.9)
    # E = B*(1-a) + E*a (models.py:155-164)
    np.testing.assert_allclose(np.asarray(out["w"]), [0.1, 0.2], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 1.2, rtol=1e-6)


def test_spa_randomization_preserves_shape_and_swaps_stats(rng):
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(8, 5, 5, 4)),
                    jnp.float32)
    out, idx = spa_randomization(x, jax.random.key(1))
    assert out.shape == x.shape
    # per-sample mean equals the swapped sample's mean
    m_in = np.asarray(jnp.mean(x.reshape(8, -1, 4), axis=1))
    m_out = np.asarray(jnp.mean(out.reshape(8, -1, 4), axis=1))
    np.testing.assert_allclose(m_out, m_in[np.asarray(idx)], rtol=1e-3,
                               atol=1e-4)


def test_spe_randomization_shape(rng):
    x = jnp.asarray(rng.normal(size=(6, 16)), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).permutation(6))
    out = spe_randomization(x, idx)
    assert out.shape == x.shape


def test_mish():
    x = jnp.asarray([-1.0, 0.0, 1.0])
    got = np.asarray(mish(x))
    want = np.asarray(x) * np.tanh(np.log1p(np.exp(np.asarray(x))))
    np.testing.assert_allclose(got, want, rtol=1e-5)
