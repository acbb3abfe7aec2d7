"""Headline benchmark: CMLPL training throughput on a PaviaU-shaped scene.

Runs the full semi-supervised CMLPL train step (dual BaseNet2, queues,
contrastive graph, both optimizer updates fused in one jit) at the reference
configuration (128 labeled + 128 unlabeled patches of 60x20x20 per step,
train.py:355-380) on whatever accelerator JAX_PLATFORMS selects (the real
TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is a documented, FLOP-derived estimate of the reference's GPU
throughput — 61 GFLOP/step at ~4.5 TFLOP/s sustained plus >=10 per-step
host->device copies and 5 .item() syncs (train.py:157-184,274-278)
=> ~25 ms/step => ~40 steps/s x 256 patches ≈ 10,000 patches/s.  The
estimate is anchored by a measured same-host run of the reference's exact
torch step (scripts/measure_reference.py, via the parity-test torch
oracle): REF_CPU_PPS_MEASURED on this image's 1-vCPU host, recorded
2026-08-16.  The driver target is >= 10x the GPU estimate.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

REF_GPU_PATCHES_PER_SEC_EST = 10_000.0
# measured by scripts/measure_reference.py on this image (torch CPU,
# reference step math via the whole-step-parity torch oracle; three runs
# 2026-08-16 gave 121.5 / 152.5 / 129.5 patches/s — mean below).  Same
# script also measured our jitted step on JAX CPU, same host: 82-99
# patches/s (XLA CPU conv codegen trails oneDNN; not the target hardware).
REF_CPU_PPS_MEASURED = 134.5
BASELINE_DERIVATION = (
    "ref GPU est: 61 GFLOP/step @ ~4.5 TFLOP/s sustained + >=10 H2D "
    "copies + 5 .item() syncs/step => ~25 ms/step => ~10k patches/s; "
    "measured anchor: reference torch step on this host's CPU = "
    f"{REF_CPU_PPS_MEASURED} patches/s (scripts/measure_reference.py)")

# PaviaU dims (registry dataID 1): 610 x 340 x 103, 9 classes
ROWS, COLS = 610, 340


def main() -> None:
    from cmlpl_tpu.core.mesh import create_mesh
    from cmlpl_tpu.data import (
        SemiSupervisedSampler,
        generate_splits,
        prepare_scene,
        synthetic_scene,
    )
    from cmlpl_tpu.eval import ScenePredictor
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

    spec = get_dataset(1)  # PaviaU constants
    cube, gt = synthetic_scene(spec, rows=ROWS, cols=COLS)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
    splits = generate_splits(scene.labels, num_label=5)

    cfg = CMLPLConfig(num_classes=spec.num_classes,
                      num_features=spec.num_bands)
    sampler = SemiSupervisedSampler(splits, scene.labels,
                                    cfg.labeled_batch, cfg.unlabeled_batch,
                                    num_unlabel=cfg.num_unlabel)
    mesh = create_mesh()
    trainer = CMLPLTrainer(cfg, mesh=mesh)
    # rbg PRNG: +32% throughput over threefry for the 8 Gaussian noise
    # views per step; the noise distribution (what the algorithm sees) is
    # identical, and all training math stays float32
    state = trainer.init_state(jax.random.key(0, impl="rbg"))

    def sync(metrics):
        # under the axon remote-TPU tunnel, block_until_ready returns at
        # enqueue time; a device->host fetch is the only honest barrier
        return float(np.asarray(metrics["acc"]).ravel()[-1])

    # warmup: compile the fused whole-run (the ENTIRE 20-epoch schedule,
    # 1,560 steps, is one dispatch)
    state, metrics = trainer.train_run(state, scene, sampler)
    sync(metrics)

    steps = cfg.num_epochs * (cfg.num_unlabel // cfg.labeled_batch)
    state = trainer.init_state(jax.random.key(1, impl="rbg"))
    t0 = time.perf_counter()
    state, metrics = trainer.train_run(state, scene, sampler)
    final_acc = sync(metrics)
    dt = time.perf_counter() - t0
    steps_per_sec = steps / dt
    patches_per_sec = steps_per_sec * (cfg.labeled_batch
                                       + cfg.unlabeled_batch)
    n_chips = jax.device_count()
    pps_per_chip = patches_per_sec / n_chips

    # full-scene inference latency (207,400 pixels), target < 5 s
    model = trainer.model

    def apply_b(params, xp, x):
        return model.apply({"params": params}, xp, x, train=False)[0]

    predictor = ScenePredictor(apply_b, patch_size=20, cols=scene.cols,
                               tile=4096, mesh=mesh)
    predictor(state.net_b.params, scene)  # compile
    t0 = time.perf_counter()
    pred = predictor(state.net_b.params, scene)
    scene_sec = time.perf_counter() - t0
    assert pred.shape[0] == ROWS * COLS

    # opt-in bf16 shift-cube gather (measured 1.48x faster scene maps,
    # identical predictions on this scene — docs/BENCHMARKS.md)
    pred_bf16 = ScenePredictor(apply_b, patch_size=20, cols=scene.cols,
                               tile=4096, mesh=mesh, gather="pallas_bf16")
    pred_bf16(state.net_b.params, scene)  # compile
    t0 = time.perf_counter()
    pb = pred_bf16(state.net_b.params, scene)
    scene_bf16_sec = time.perf_counter() - t0
    bf16_agree = float(np.mean(pb == pred))

    print(json.dumps({
        "metric": "cmlpl_train_patches_per_sec_per_chip",
        "value": round(pps_per_chip, 1),
        "unit": "patches/s/chip",
        "vs_baseline": round(pps_per_chip / REF_GPU_PATCHES_PER_SEC_EST, 3),
        "extra": {
            "steps_per_sec": round(steps_per_sec, 2),
            "full_20epoch_train_sec": round(dt, 3),
            "full_scene_paviau_sec": round(scene_sec, 3),
            "full_scene_paviau_bf16_gather_sec": round(scene_bf16_sec, 3),
            "bf16_gather_prediction_agreement": round(bf16_agree, 5),
            "full_scene_target_sec": 5.0,
            "final_train_acc": round(final_acc, 4),
            "n_chips": n_chips,
            "timed_steps": steps,
            "baseline": {
                "ref_gpu_pps_est": REF_GPU_PATCHES_PER_SEC_EST,
                "ref_cpu_pps_measured": REF_CPU_PPS_MEASURED,
                "vs_measured_cpu_ref": round(
                    pps_per_chip / REF_CPU_PPS_MEASURED, 1),
                "derivation": BASELINE_DERIVATION,
            },
        },
    }))


if __name__ == "__main__":
    main()
