"""Per-dataset real-TPU bench sweep (VERDICT r1 item 9).

Runs the fused CMLPL training run + full-scene classification map at every
registered dataset's REAL geometry (PaviaU 610x340x103, Salinas
512x217x204, Houston 349x1905x144 — SURVEY §5's declared scale axis at
664,845 pixels — and Indian Pines 145x145x200), on synthetic cubes with
those exact dims when the .mat files are absent (throughput depends on
shapes, not pixel values).

Prints one BENCH-style JSON line per dataset; the scene-map target is the
driver's <5 s bar (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_ids", nargs="+", type=int, default=[1, 2, 3, 4])
    p.add_argument("--data_root", default="./dataset")
    p.add_argument("--gather_impl", default="pool",
                   help="training gather (default: the r3 pool gather, "
                        "bench.py's headline path)")
    args = p.parse_args()

    from cmlpl_tpu.core.mesh import create_mesh
    from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                                prepare_scene)
    from cmlpl_tpu.eval import ScenePredictor
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

    mesh = create_mesh()

    def sync_train(metrics):
        return float(np.asarray(metrics["acc"]).ravel()[-1])

    for data_id in args.data_ids:
        spec = get_dataset(data_id)
        # real .mat if present, synthetic at the real dims otherwise
        # (prepare_scene warns on the fallback)
        scene = prepare_scene(spec, root=args.data_root, patch_size=20,
                              n_pc=60)
        splits = generate_splits(scene.labels, num_label=5)
        cfg = CMLPLConfig(num_classes=spec.num_classes,
                          num_features=spec.num_bands,
                          gather_impl=args.gather_impl)
        sampler = SemiSupervisedSampler(
            splits, scene.labels, cfg.labeled_batch, cfg.unlabeled_batch,
            num_unlabel=cfg.num_unlabel)
        trainer = CMLPLTrainer(cfg, mesh=mesh)
        steps = cfg.num_epochs * (cfg.num_unlabel // cfg.labeled_batch)

        state = trainer.init_state(jax.random.key(0, impl="rbg"))
        state, metrics = trainer.train_run(state, scene, sampler)  # compile
        sync_train(metrics)
        state = trainer.init_state(jax.random.key(1, impl="rbg"))
        t0 = time.perf_counter()
        state, metrics = trainer.train_run(state, scene, sampler)
        sync_train(metrics)
        train_sec = time.perf_counter() - t0

        model = trainer.model

        def apply_b(params, xp, x):
            return model.apply({"params": params}, xp, x, train=False)[0]

        predictor = ScenePredictor(apply_b, patch_size=20,
                                   cols=scene.cols, tile=4096, mesh=mesh)
        predictor(state.net_b.params, scene)  # compile
        t0 = time.perf_counter()
        pred = predictor(state.net_b.params, scene)
        scene_sec = time.perf_counter() - t0
        assert pred.shape[0] == spec.num_pixels

        print(json.dumps({
            "dataset": spec.name,
            "gather_impl": args.gather_impl,
            "dims": [spec.rows, spec.cols, spec.num_bands],
            "num_pixels": spec.num_pixels,
            "train_20epoch_sec": round(train_sec, 3),
            "train_patches_per_sec": round(
                steps * (cfg.labeled_batch + cfg.unlabeled_batch)
                / train_sec, 1),
            "full_scene_map_sec": round(scene_sec, 3),
            "scene_pixels_per_sec": round(spec.num_pixels / scene_sec, 1),
            "scene_target_sec": 5.0,
        }), flush=True)


if __name__ == "__main__":
    main()
