"""Generic supervised backbone trainer (zoo coverage end to end)."""

import jax
import numpy as np
import pytest

from cmlpl_tpu.data import generate_splits, prepare_scene, synthetic_scene
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy
from cmlpl_tpu.models.zoo import build_model
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train.supervised import SupervisedTrainer


@pytest.fixture(scope="module")
def base_scene():
    """Odd-window scene for base models (SampleGen_for_base semantics)."""
    cube, gt = synthetic_scene(0)
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=9, n_pc=103)
    return scene


def _train_and_eval(name, scene, n_pc, w, augment=False, epochs=12,
                    scan_run=True):
    spec = get_dataset(0)
    model, entry = build_model(name, spec, n_pc)
    splits = generate_splits(scene.labels, num_label=5)
    trainer = SupervisedTrainer(model, entry, patch_size=w, n_pc=n_pc,
                                num_features=spec.num_bands,
                                augment=augment, donate=False)
    state = trainer.init_state(jax.random.key(0))
    state, history = trainer.fit(
        state, scene, splits.train, scene.labels, batch_size=45,
        num_epochs=epochs, log_every=0, scan_run=scan_run)
    predictor = ScenePredictor(trainer.logits_fn(), patch_size=w,
                               cols=scene.cols, tile=256)
    pred = predictor(trainer.eval_variables(state), scene)
    acc = cal_accuracy(pred[splits.test], scene.labels[splits.test] - 1)
    return acc, history


def test_dbda_supervised_end_to_end(base_scene):
    acc, history = _train_and_eval("dbda", base_scene, 103, 9, scan_run=False)
    assert float(history[-1]["cls_loss"]) < float(history[0]["cls_loss"])
    # 12 steps only exercise the pipeline, not the model: BatchNorm
    # running stats are barely warmed — just require above chance (1/9)
    assert acc.oa > 0.12


def test_basenet2_supervised_with_augment(base_scene):
    cube, gt = synthetic_scene(0)
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=20, n_pc=16)
    acc, history = _train_and_eval("basenet2", scene, 16, 20, augment=True)
    assert acc.oa > 0.5


def test_ssftt_supervised_smoke():
    cube, gt = synthetic_scene(0)
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=13, n_pc=5)
    acc, history = _train_and_eval("ssftt", scene, 5, 13, epochs=4, scan_run=False)
    assert np.isfinite(float(history[-1]["cls_loss"]))


def test_ema_teacher_tracks_reference_formula():
    """--ema_teacher: the carried EMA copy equals the hand-replayed
    E = B*(1-a) + E*a recursion over the per-step student params
    (reference WeightEMA_BN, tools/models.py:155-164), and
    eval_variables(ema=True) serves it."""
    cube, gt = synthetic_scene(0, rows=24, cols=20)
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=20, n_pc=8)
    spec = get_dataset(0)
    model, entry = build_model("basenet2", spec, 8)
    splits = generate_splits(scene.labels, num_label=5)
    alpha = 0.9
    trainer = SupervisedTrainer(model, entry, patch_size=20, n_pc=8,
                                num_features=spec.num_bands,
                                ema_alpha=alpha, donate=False)
    state = trainer.init_state(jax.random.key(0))

    # replay: collect the student params after each of 3 steps
    rng = np.random.default_rng(0)
    expected = jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats})
    for _ in range(3):
        li = rng.choice(splits.train, 16).astype(np.int32)
        ly = (scene.labels[li] - 1).astype(np.int32)
        state, _ = trainer.train_step(state, scene, li, ly)
        student = jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats})
        expected = jax.tree_util.tree_map(
            lambda b, e: b * (1 - alpha) + e * alpha, student, expected)

    got = jax.device_get(state.ema)
    jax.tree_util.tree_map(
        lambda e, g: np.testing.assert_allclose(e, g, rtol=1e-5,
                                                atol=1e-6),
        expected, got)
    ev = trainer.eval_variables(state, ema=True)
    np.testing.assert_array_equal(
        jax.device_get(ev["params"]["classifier"]["kernel"]),
        got["params"]["classifier"]["kernel"])

    # disabled => no EMA leaf, eval_variables(ema=True) refuses
    t2 = SupervisedTrainer(model, entry, patch_size=20, n_pc=8,
                           num_features=spec.num_bands, donate=False)
    s2 = t2.init_state(jax.random.key(0))
    assert s2.ema == ()
    with pytest.raises(ValueError):
        t2.eval_variables(s2, ema=True)
