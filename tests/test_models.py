"""Model topology parity: shapes, feature normalisation, parameter counts
(against hand-computed counts of the reference torch layers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmlpl_tpu.models import BaseNet1, BaseNet2, CCTNet, Decoder, LinearClassifier


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _init(model, xp_shape, x_shape):
    xp = jnp.zeros(xp_shape)
    x = jnp.zeros(x_shape)
    params = model.init(jax.random.key(0), xp, x, train=False)["params"]
    return params, xp, x


def test_basenet2_shapes_and_feature_norm():
    model = BaseNet2(num_features=103, dropout=0.8, num_classes=9, n_pc=60)
    params, _, _ = _init(model, (2, 20, 20, 60), (2, 103))
    xp = jnp.asarray(np.random.default_rng(0).normal(size=(4, 20, 20, 60)),
                     jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 103)),
                    jnp.float32)
    logits, feat = model.apply({"params": params}, xp, x, train=False)
    assert logits.shape == (4, 9)
    assert feat.shape == (4, 1024)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feat), axis=1), 1.0, rtol=1e-5)


def test_basenet2_param_count_matches_reference_topology():
    # Reference BaseNet2 (models.py:97-152) trainable tensor sizes:
    #   conv0 60->64 1x1 (+b), conv1/conv2 64->64 3x3 (+b),
    #   feat_spe 103->1024 (+b), feat_ss 1024->256 (+b),
    #   feat_ss2 1024->64 (+b), feat_ss3 256->64 (+b),
    #   classifier 2624->9 (+b)
    # feat_ss/feat_ss2/feat_ss3 are constructed but unused in forward
    # (models.py:122-126); we do not create them, so expected counts are
    # the used subset:
    expected = ((60 * 64 + 64) + 2 * (64 * 64 * 9 + 64)
                + (103 * 1024 + 1024) + (2624 * 9 + 9))
    model = BaseNet2(num_features=103, num_classes=9, n_pc=60)
    params, _, _ = _init(model, (1, 20, 20, 60), (1, 103))
    assert _param_count(params) == expected


def test_basenet2_dropout_train_vs_eval():
    model = BaseNet2(num_features=103, dropout=0.8, num_classes=9, n_pc=60)
    params, _, _ = _init(model, (1, 20, 20, 60), (1, 103))
    xp = jnp.ones((8, 20, 20, 60))
    x = jnp.ones((8, 103))
    eval_logits, _ = model.apply({"params": params}, xp, x, train=False)
    train_logits, _ = model.apply(
        {"params": params}, xp, x, train=True,
        rngs={"dropout": jax.random.key(1)})
    # dropout active in train mode -> different logits
    assert not np.allclose(np.asarray(eval_logits), np.asarray(train_logits))
    # eval is deterministic
    eval_logits2, _ = model.apply({"params": params}, xp, x, train=False)
    np.testing.assert_array_equal(np.asarray(eval_logits),
                                  np.asarray(eval_logits2))


def test_basenet1_shapes():
    model = BaseNet1(num_features=103, num_classes=9, n_pc=5)
    params, _, _ = _init(model, (1, 20, 20, 5), (1, 103))
    xp = jnp.ones((3, 20, 20, 5))
    x = jnp.ones((3, 103))
    logits, feat = model.apply({"params": params}, xp, x, train=False)
    assert logits.shape == (3, 9)
    assert feat.shape == (3, 256)


def test_cct_net_and_decoder():
    model = CCTNet(num_features=103, num_classes=9, n_pc=60)
    params, _, _ = _init(model, (1, 20, 20, 60), (1, 103))
    xp = jnp.ones((3, 20, 20, 60))
    x = jnp.ones((3, 103))
    fea1, fea2 = model.apply({"params": params}, xp, x, train=False)
    assert fea1.shape == (3, 2624)
    np.testing.assert_array_equal(np.asarray(fea1), np.asarray(fea2))

    head = LinearClassifier(9)
    hp = head.init(jax.random.key(0), fea1)["params"]
    out = head.apply({"params": hp}, fea1)
    assert out.shape == (3, 9)

    dec = Decoder(num_features=103, n_pc=60, patch_size=20)
    dp = dec.init(jax.random.key(0), jnp.ones((2, 256)))["params"]
    y_re, x_re = dec.apply({"params": dp}, jnp.ones((2, 256)))
    assert y_re.shape == (2, 103)
    assert x_re.shape == (2, 20, 20, 60)


def test_cct_with_decoder_flag():
    model = CCTNet(num_features=103, num_classes=9, n_pc=60,
                   with_decoder=True)
    xp = jnp.ones((2, 20, 20, 60))
    x = jnp.ones((2, 103))
    params = model.init(jax.random.key(0), xp, x, train=False)["params"]
    fea1, fea2, (y_re, x_re) = model.apply({"params": params}, xp, x,
                                           train=False)
    assert y_re.shape == (2, 103)
    assert x_re.shape == (2, 20, 20, 60)


@pytest.mark.parametrize("w", [8, 20])
def test_basenet2_other_patch_sizes(w):
    model = BaseNet2(num_features=50, num_classes=5, n_pc=12)
    xp = jnp.ones((2, w, w, 12))
    x = jnp.ones((2, 50))
    params = model.init(jax.random.key(0), xp, x, train=False)["params"]
    logits, _ = model.apply({"params": params}, xp, x, train=False)
    assert logits.shape == (2, 5)


def test_cctnet_bf16_compute_promotes_features():
    """r3c: CCTNet accepts a compute dtype (the bf16 knob silently
    no-op'd for the CCT trainer before) and promotes the joint feature
    back to f32 for the decoder-head / JS-loss math."""
    import jax.numpy as jnp

    model = CCTNet(num_features=103, num_classes=9, n_pc=16,
                   dtype=jnp.bfloat16)
    xp = jnp.ones((2, 20, 20, 16))
    x = jnp.ones((2, 103))
    params = model.init(jax.random.key(0), xp, x, train=False)["params"]
    f1, f2 = model.apply({"params": params}, xp, x, train=False)
    assert f1.dtype == jnp.float32 and f2.dtype == jnp.float32
    # params stay f32 (flax param_dtype default)
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))
    # bf16 compute tracks the f32 forward
    model32 = CCTNet(num_features=103, num_classes=9, n_pc=16)
    g1, _ = model32.apply({"params": params}, xp, x, train=False)
    assert jnp.allclose(f1, g1, rtol=2e-2, atol=2e-2)
