"""Backbone-zoo comparison on the hard synthetic scene.

The rebuild's analogue of the reference paper's comparison-model table
(tools/conpared_models.py is the zoo; the reference ships no training
script for it).  Every zoo model is trained supervised-only with the SAME
protocol as scripts/compare_methods.py's supervised arm (5 labels/class,
20 epochs-equivalent step budget) at its own default patch/channel
geometry, then evaluated with the full-scene predictor on the identical
byte-identical splits.

Run on the TPU: ``python scripts/compare_backbones.py`` (each model costs
one fused-run compile).  Prints one JSON line per model plus a summary
table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.data import generate_splits, prepare_scene, synthetic_scene
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy
from cmlpl_tpu.models.zoo import ZOO, build_model
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train.supervised import SupervisedTrainer

NUM_LABEL = 5


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", nargs="+", default=sorted(ZOO.keys()))
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--num_epochs", type=int, default=20)
    args = ap.parse_args(argv)

    spec = get_dataset(1)
    cube, gt = synthetic_scene(spec, rows=200, cols=150, noise_std=1.2,
                               class_sep=0.35)
    mesh = create_mesh()
    results = {}

    for name in args.models:
        entry = ZOO[name]
        w = entry.default_patch
        n_pc = entry.default_n_pc
        if n_pc == -1:
            n_pc = spec.num_bands
        scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=w,
                              n_pc=n_pc)
        splits = generate_splits(scene.labels, num_label=NUM_LABEL)
        oas = []
        t0 = time.time()
        for seed in range(args.seeds):
            model, entry = build_model(name, spec, n_pc)
            trainer = SupervisedTrainer(model, entry, patch_size=w,
                                        n_pc=n_pc,
                                        num_features=spec.num_bands,
                                        mesh=mesh)
            st = trainer.init_state(jax.random.key(seed, impl="rbg"))
            st, _ = trainer.fit(
                st, scene, splits.train, scene.labels,
                batch_size=min(45, len(splits.train)),
                num_epochs=args.num_epochs,
                epoch_samples=10000, log_every=0)
            predictor = ScenePredictor(trainer.logits_fn(), patch_size=w,
                                       cols=scene.cols, tile=2048,
                                       mesh=mesh)
            pred = predictor(trainer.eval_variables(st), scene)
            acc = cal_accuracy(pred[splits.test],
                               scene.labels[splits.test] - 1)
            oas.append(acc.oa * 100)
        results[name] = oas
        print(json.dumps({"model": name, "w": w, "n_pc": n_pc,
                          "oa": [round(v, 2) for v in oas],
                          "mean": round(float(np.mean(oas)), 2),
                          "std": round(float(np.std(oas)), 2),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    print(f"{'model':14s} {'OA mean':>8s} {'std':>6s}  "
          f"({args.seeds} seeds, {NUM_LABEL} labels/class, hard "
          "synthetic 200x150 scene, supervised-only)")
    for name, oas in results.items():
        print(f"{name:14s} {np.mean(oas):8.2f} {np.std(oas):6.2f}")


if __name__ == "__main__":
    main()
