"""Per-dataset config wiring: every registered dataset's band/class
constants flow through prep -> CMLPL step -> inference without shape
errors (synthetic cubes at reduced spatial size)."""

import jax
import numpy as np
import pytest

from cmlpl_tpu.data import (
    SemiSupervisedSampler,
    generate_splits,
    prepare_scene,
    synthetic_scene,
)
from cmlpl_tpu.eval import ScenePredictor
from cmlpl_tpu.registry import DATASETS, get_dataset
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer


@pytest.mark.parametrize("data_id", [1, 2, 3, 4])
def test_dataset_end_to_end_step(data_id):
    spec = get_dataset(data_id)
    cube, gt = synthetic_scene(spec, rows=48, cols=40)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=16)
    splits = generate_splits(scene.labels, num_label=3)
    cfg = CMLPLConfig(num_classes=spec.num_classes,
                      num_features=spec.num_bands, n_pc=16,
                      labeled_batch=8, unlabeled_batch=8, num_unlabel=16,
                      num_epochs=1)
    sampler = SemiSupervisedSampler(splits, scene.labels, 8, 8,
                                    num_unlabel=16)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    li, ly, ui = next(iter(sampler.epoch()))
    state, metrics = trainer.train_step(state, scene, li, ly, ui, 0, 0)
    assert np.isfinite(float(metrics["total_loss"]))

    model = trainer.model
    predictor = ScenePredictor(
        lambda p, xp, x: model.apply({"params": p}, xp, x, train=False)[0],
        patch_size=20, cols=scene.cols, tile=128)
    pred = predictor(state.net_b.params, scene)
    assert pred.shape == (scene.num_pixels,)
    assert pred.max() < spec.num_classes


def test_registry_constants_match_reference():
    # train.py:75-90 constants
    want = {1: (9, 103), 2: (16, 204), 3: (15, 144), 4: (16, 200)}
    for did, (ncls, bands) in want.items():
        spec = DATASETS[did]
        assert spec.num_classes == ncls
        assert spec.num_bands == bands
    # scene dims (hyper_tools.py:64-170)
    dims = {1: (610, 340), 2: (512, 217), 3: (349, 1905), 4: (145, 145)}
    for did, (r, c) in dims.items():
        assert (DATASETS[did].rows, DATASETS[did].cols) == (r, c)
    # palettes have one colour per class
    for did in [1, 2, 3, 4]:
        assert DATASETS[did].palette.shape == (DATASETS[did].num_classes, 3)
