"""Label-efficiency curve: OA at 5/10/20/30 labels/class
(BASELINE.json config "num_label sweep"), for any of the three
semi-supervised algorithms (--algo cmlpl|cps|cct).

Run on the TPU: ``python scripts/label_sweep.py [--algo cps]``.  All
shapes are identical across sweep points, so the fused training run
compiles once per algorithm.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import numpy as np

from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.data import (
    SemiSupervisedSampler,
    generate_splits,
    prepare_scene,
    synthetic_scene,
)
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train import (CCTTrainer, CMLPLConfig, CMLPLTrainer,
                             CPSTrainer)

NUM_LABELS = [5, 10, 20, 30]
SEEDS = [0, 1]
ALGOS = {"cmlpl": CMLPLTrainer, "cps": CPSTrainer, "cct": CCTTrainer}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="cmlpl", choices=sorted(ALGOS))
    args = ap.parse_args(argv)
    spec = get_dataset(1)
    cube, gt = synthetic_scene(spec, rows=200, cols=150, noise_std=1.2,
                               class_sep=0.35)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
    mesh = create_mesh()
    cfg = CMLPLConfig(num_classes=spec.num_classes,
                      num_features=spec.num_bands)
    trainer = ALGOS[args.algo](cfg, mesh=mesh)

    if args.algo == "cct":
        enc, head = trainer.encoder, trainer.head

        def apply_fn(p, xp, x):
            fea, _ = enc.apply({"params": p["encoder"]}, xp, x,
                               train=False)
            return head.apply({"params": p["dec_base"]}, fea)
    else:
        model = trainer.model

        def apply_fn(p, xp, x):
            return model.apply({"params": p}, xp, x, train=False)[0]

    predictor = ScenePredictor(apply_fn, patch_size=20, cols=scene.cols,
                               tile=2048, mesh=mesh)

    print(f"{args.algo}: {'labels/class':>12s} {'OA mean':>8s} {'std':>6s}")
    for num_label in NUM_LABELS:
        splits = generate_splits(scene.labels, num_label=num_label)
        oas = []
        for seed in SEEDS:
            sampler = SemiSupervisedSampler(
                splits, scene.labels, cfg.labeled_batch,
                cfg.unlabeled_batch, num_unlabel=cfg.num_unlabel,
                seed=seed)
            state = trainer.init_state(jax.random.key(seed, impl="rbg"))
            state, _ = trainer.fit(state, scene, sampler, log_every=0)
            params = state.params if args.algo == "cct" else \
                state.net_b.params
            pred = predictor(params, scene)
            acc = cal_accuracy(pred[splits.test],
                               scene.labels[splits.test] - 1)
            oas.append(acc.oa)
        print(f"{num_label:12d} {np.mean(oas) * 100:8.2f} "
              f"{np.std(oas) * 100:6.2f}")


if __name__ == "__main__":
    main()
