"""Full-scene inference + metric tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cmlpl_tpu.data.patches import gather_patches
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy
from cmlpl_tpu.eval.visualize import draw_result
from cmlpl_tpu.models import BaseNet2


def test_scene_predictor_matches_direct_forward(tiny_scene):
    model = BaseNet2(num_features=103, num_classes=9, n_pc=tiny_scene.n_pc)
    xp0 = jnp.zeros((1, 20, 20, tiny_scene.n_pc))
    x0 = jnp.zeros((1, 103))
    params = model.init(jax.random.key(0), xp0, x0, train=False)["params"]

    def apply(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    predictor = ScenePredictor(apply, patch_size=20, cols=tiny_scene.cols,
                               tile=256)
    preds = predictor(params, tiny_scene)
    assert preds.shape == (tiny_scene.num_pixels,)

    # direct forward over a slice of pixels must agree
    idx = np.arange(300, 428, dtype=np.int32)
    xp = gather_patches(tiny_scene.padded_pca, jnp.asarray(idx),
                        cols=tiny_scene.cols, w=20)
    x = jnp.take(tiny_scene.spectra, jnp.asarray(idx), axis=0)
    direct = np.asarray(jnp.argmax(apply(params, xp, x), axis=-1))
    np.testing.assert_array_equal(preds[idx], direct)


def test_cal_accuracy_perfect_and_kappa():
    y = np.array([0, 0, 1, 1, 2, 2])
    acc = cal_accuracy(y, y)
    assert acc.oa == 1.0
    assert acc.kappa == 1.0
    np.testing.assert_allclose(acc.producer, 1.0)


def test_cal_accuracy_known_value():
    # hand-computed example: 2 classes, n=4
    label = np.array([0, 0, 1, 1])
    pred = np.array([0, 1, 1, 1])
    acc = cal_accuracy(pred, label)
    assert acc.oa == 0.75
    # correct = [1, 2]; real = [2, 2]; predi = [1, 3]
    # kappa = (4*3 - (2*1 + 2*3)) / (16 - 8) = (12 - 8) / 8 = 0.5
    assert acc.kappa == 0.5
    np.testing.assert_allclose(acc.producer, [0.5, 1.0])


def test_draw_result_palette(tiny_scene):
    labels = tiny_scene.labels.copy()
    img = draw_result(labels, 0, rows=tiny_scene.rows, cols=tiny_scene.cols)
    assert img.shape == (tiny_scene.rows, tiny_scene.cols, 3)
    # background (label 0) is black
    flat = img.reshape(-1, 3)
    np.testing.assert_allclose(flat[labels == 0], 0.0)
    assert img.max() <= 1.0


def test_scene_predictor_pallas_bf16_gather(tiny_scene):
    """The opt-in bf16-DMA inference gather (interpret mode on CPU)
    agrees with the default path on nearly every pixel (bf16 INPUT
    quantisation can flip genuinely ambiguous pixels only)."""
    model = BaseNet2(num_features=103, num_classes=9, n_pc=tiny_scene.n_pc)
    xp0 = jnp.zeros((1, 20, 20, tiny_scene.n_pc))
    x0 = jnp.zeros((1, 103))
    params = model.init(jax.random.key(1), xp0, x0, train=False)["params"]

    def apply(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    base = ScenePredictor(apply, patch_size=20, cols=tiny_scene.cols,
                          tile=256)(params, tiny_scene)
    bf16 = ScenePredictor(apply, patch_size=20, cols=tiny_scene.cols,
                          tile=256, gather="pallas_bf16")(params,
                                                          tiny_scene)
    assert bf16.shape == base.shape
    agree = np.mean(bf16 == base)
    assert agree > 0.99, f"bf16 gather flipped {100*(1-agree):.2f}% pixels"


def test_scene_predictor_pallas_fallback_over_128_channels():
    """Mosaic memref_slice needs 8-aligned column slices once the cube
    spans >1 128-lane tile, so an explicit (or auto) pallas gather must
    fall back to XLA for >128-channel scenes (odd-w zoo models on raw
    200-band Indian Pines crashed the sweep before this guard) and keep
    producing correct predictions."""
    from cmlpl_tpu.data import prepare_scene, synthetic_scene
    from cmlpl_tpu.registry import get_dataset

    import dataclasses

    spec = dataclasses.replace(get_dataset(0), num_bands=200)
    cube, gt = synthetic_scene(spec, rows=24, cols=20)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=9, n_pc=200)

    model = BaseNet2(num_features=200, num_classes=9, n_pc=200)
    xp0 = jnp.zeros((1, 9, 9, 200))
    x0 = jnp.zeros((1, 200))
    params = model.init(jax.random.key(0), xp0, x0, train=False)["params"]

    def apply(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    pal = ScenePredictor(apply, patch_size=9, cols=scene.cols, tile=128,
                         gather="pallas")
    assert pal._gather_mode(scene.padded_pca.shape[-1]) == "xla"
    assert pal._gather_mode(128) == "pallas"
    xla = ScenePredictor(apply, patch_size=9, cols=scene.cols, tile=128,
                         gather="xla")
    np.testing.assert_array_equal(pal(params, scene), xla(params, scene))


def test_dense_eval_matches_patch_eval(tiny_scene, tiny_splits):
    """--eval_gather dense (one dilated whole-scene conv pass, no patch
    gather): boundary semantics differ from patch eval by design (each
    patch zero-pads its own conv edges; dense sees true neighbours), so
    the pin is high agreement + near-identical OA on a TRAINED net, not
    bitwise equality."""
    from cmlpl_tpu.data import SemiSupervisedSampler
    from cmlpl_tpu.eval.inference import dense_scene_logits
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

    scene, splits = tiny_scene, tiny_splits
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=20, labeled_batch=16, unlabeled_batch=16,
                      num_unlabel=64, num_epochs=4)
    tr = CMLPLTrainer(cfg, donate=False)
    st = tr.init_state(jax.random.key(0))
    sam = SemiSupervisedSampler(splits, scene.labels, 16, 16,
                                num_unlabel=64)
    st, _ = tr.train_run(st, scene, sam)
    params = jax.device_get(st.net_b.params)

    model = BaseNet2(num_features=103, num_classes=9, n_pc=scene.n_pc)

    def apply(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    patch = ScenePredictor(apply, patch_size=20, cols=scene.cols,
                           tile=256)(params, scene)
    dense = ScenePredictor(apply, patch_size=20, cols=scene.cols,
                           tile=256, gather="dense")(params, scene)
    agree = float((dense == patch).mean())
    assert agree >= 0.98, agree

    y = scene.labels[splits.test] - 1
    oa_p = float((patch[splits.test] == y).mean())
    oa_d = float((dense[splits.test] == y).mean())
    assert abs(oa_p - oa_d) <= 0.01, (oa_p, oa_d)

    # logits agree closely too (the public helper)
    dl = np.asarray(dense_scene_logits(params, scene))
    assert np.argmax(dl, -1).astype(np.int32).tolist() == dense.tolist()

    # guards: odd patch width and non-BaseNet2 params refuse loudly
    import pytest

    bad = ScenePredictor(apply, patch_size=9, cols=scene.cols,
                         gather="dense")
    with pytest.raises(ValueError, match="patch_size"):
        import dataclasses

        bad(params, dataclasses.replace(scene, patch_size=9))
    with pytest.raises(ValueError, match="shaped params"):
        ScenePredictor(apply, patch_size=20, cols=scene.cols,
                       gather="dense")({"conv0": params["conv0"]}, scene)


def test_dense_disagreement_is_conv_pad_semantics_only(tiny_scene):
    """Pin WHERE dense may disagree with the patch evaluator (VERDICT r3
    item 8).

    The only divergence source is conv zero-pad placement: the patch
    evaluator zero-pads each patch's OWN 3x3 conv halo (the w-wide patch
    border, distance w/2 from its centre pixel — models.py:104-111 pad
    semantics), while the dense pass pads only at the padded-cube border
    and sees true neighbours everywhere else.  That halo sits inside
    EVERY pixel's classifier receptive field, so disagreements on a
    trained net are border-CONCENTRATED but not border-confined
    (measured, trained nets, 48x40 scenes at all four geometries: ~1-3%
    of pixels disagree, roughly two thirds within w/2 of the scene
    border, the rest interior).

    The pin: restrict conv1/conv2 to their centre tap — padding can then
    influence nothing — and the dense logits must match the true patch
    logits everywhere, border and interior alike, up to summation-order
    float noise.  This proves there is no OTHER divergence (pooling
    arithmetic, classifier fold, spectral branch) hiding behind the
    boundary story."""
    import jax.numpy as jnp

    from cmlpl_tpu.eval.inference import dense_scene_logits

    scene = tiny_scene
    model = BaseNet2(num_features=103, num_classes=9, n_pc=scene.n_pc)
    xp0 = jnp.zeros((1, 20, 20, scene.n_pc))
    x0 = jnp.zeros((1, 103))
    params = model.init(jax.random.key(3), xp0, x0,
                        train=False)["params"]

    def center_tap_only(p):
        k = np.array(p["kernel"])  # (3, 3, I, O)
        out = np.zeros_like(k)
        out[1, 1] = k[1, 1]
        return dict(p, kernel=jnp.asarray(out))

    params = dict(params, conv1=center_tap_only(params["conv1"]),
                  conv2=center_tap_only(params["conv2"]))

    # true patch logits: the padded-cube window gather + model forward
    idx = np.arange(scene.num_pixels, dtype=np.int32)
    r, c = idx // scene.cols, idx % scene.cols
    padded = np.asarray(scene.padded_pca)

    def patch_logits(chunk):
        xp = np.stack([padded[ri:ri + 20, ci:ci + 20, :scene.n_pc]
                       for ri, ci in chunk])
        x = np.asarray(scene.spectra)[chunk[:, 0] * scene.cols
                                      + chunk[:, 1]]
        return np.asarray(model.apply({"params": params}, jnp.asarray(xp),
                                      jnp.asarray(x), train=False)[0])

    rc = np.stack([r, c], axis=1)
    pl = np.concatenate([patch_logits(rc[i:i + 512])
                         for i in range(0, len(rc), 512)])
    dl = np.asarray(dense_scene_logits(params, scene))

    np.testing.assert_allclose(dl, pl, rtol=2e-4, atol=2e-4)
    mismatch = np.argmax(dl, -1) != np.argmax(pl, -1)
    if mismatch.any():
        # an argmax flip is only acceptable at a float-noise tie
        gaps = np.sort(pl[mismatch], axis=-1)
        assert (gaps[:, -1] - gaps[:, -2] < 1e-3).all()


def test_dense_eval_sharded_matches_single_device(tiny_scene):
    """Dense eval GSPMD-partitions over the mesh (rows sharded inside
    the jit via with_sharding_constraint; XLA inserts conv halo
    exchanges) and must equal the single-device result exactly — scene
    rows are NOT divisible by 8, exercising GSPMD's internal padding."""
    from cmlpl_tpu.core.mesh import create_mesh, create_mesh_2d

    scene = tiny_scene
    model = BaseNet2(num_features=103, num_classes=9, n_pc=scene.n_pc)
    params = model.init(
        jax.random.key(3), np.zeros((1, 20, 20, scene.n_pc), np.float32),
        np.zeros((1, 103), np.float32), train=False)["params"]

    def apply(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    ref = ScenePredictor(apply, patch_size=20, cols=scene.cols,
                         gather="dense")(params, scene)
    for mesh in [create_mesh(jax.devices()[:8]),
                 create_mesh_2d(jax.devices()[:8], tp=2)]:
        out = ScenePredictor(apply, patch_size=20, cols=scene.cols,
                             gather="dense", mesh=mesh)(params, scene)
        assert (out == ref).all(), dict(mesh.shape)


def test_dense_eval_cct(tiny_scene, tiny_splits):
    """CCT dense eval: the CCT eval path is dec_base(encoder(xp, x))
    (trian_CCT.py:246 -> hyper_tools.py:462-484) and CCTNet's stem +
    flatten order are identical to BaseNet2's, so --eval_gather dense
    applies via the params view (_dense_params_view)."""
    from cmlpl_tpu.data import SemiSupervisedSampler
    from cmlpl_tpu.train import CMLPLConfig
    from cmlpl_tpu.train.cct import CCTTrainer

    scene, splits = tiny_scene, tiny_splits
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                      patch_size=20, labeled_batch=16, unlabeled_batch=16,
                      num_unlabel=64, num_epochs=4)
    tr = CCTTrainer(cfg, donate=False)
    st = tr.init_state(jax.random.key(0))
    sam = SemiSupervisedSampler(splits, scene.labels, 16, 16,
                                num_unlabel=64)
    st, _ = tr.train_run(st, scene, sam)
    params = jax.device_get(st.params)

    def apply_cct(p, xp, x):
        fea, _ = tr.encoder.apply({"params": p["encoder"]}, xp, x,
                                  train=False)
        return tr.head.apply({"params": p["dec_base"]}, fea)

    patch = ScenePredictor(apply_cct, patch_size=20, cols=scene.cols,
                           tile=256)(params, scene)
    dense = ScenePredictor(apply_cct, patch_size=20, cols=scene.cols,
                           tile=256, gather="dense")(params, scene)
    agree = float((dense == patch).mean())
    assert agree >= 0.98, agree

    y = scene.labels[splits.test] - 1
    oa_p = float((patch[splits.test] == y).mean())
    oa_d = float((dense[splits.test] == y).mean())
    assert abs(oa_p - oa_d) <= 0.01, (oa_p, oa_d)
