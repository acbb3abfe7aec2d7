"""A/B the training patch-gather implementations on the real TPU.

VERDICT r1 item 5: the fused-epoch profile attributes ~30% of device time
to the two per-step patch gathers (docs/BENCHMARKS.md); the f32 Pallas
kernel was rejected for training in r1 because lane-padding 60->128
channels moves 2.1x the bytes.  This script measures the honest fused-run
wall time (device->host sync, see bench.py) of the gather_impl knob:

  xla          vmapped dynamic_slice (r1 default)
  pallas       Pallas DMA, f32 cube lane-padded (expected loser, recorded)
  pallas_bf16  Pallas DMA, bf16 cube (half the DMA bytes vs pallas;
               patches upcast to f32 after the gather)
  pool         pre-gather the unique ~10,045-pixel training pool once per
               dispatch (~0.97 GB HBM); in-scan gathers become contiguous
               row takes (VERDICT r2 item 2; numerically identical to xla)

Same scene/schedule as bench.py (PaviaU-shaped, 20 epochs x 78 steps,
batch 128+128).  Prints one JSON line per impl.
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

ROWS, COLS = 610, 340


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--impls", nargs="+",
                   default=["xla", "pallas", "pallas_bf16", "pool"])
    p.add_argument("--no_mesh", action="store_true",
                   help="trainer without a mesh (bench.py uses a "
                        "1-device mesh)")
    p.add_argument("--repeats", type=int, default=2,
                   help="timed runs per impl (after the compile run)")
    p.add_argument("--stack_nets", action="store_true",
                   help="stack the two nets' forwards into single "
                        "batched kernels (CMLPLConfig.stack_nets)")
    args = p.parse_args()

    from cmlpl_tpu.core.mesh import create_mesh
    from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                                prepare_scene, synthetic_scene)
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

    spec = get_dataset(1)
    cube, gt = synthetic_scene(spec, rows=ROWS, cols=COLS)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
    splits = generate_splits(scene.labels, num_label=5)

    def sync(metrics):
        # device->host fetch: the only honest barrier over the tunnel
        return float(np.asarray(metrics["acc"]).ravel()[-1])

    for impl in args.impls:
        cfg = CMLPLConfig(num_classes=spec.num_classes,
                          num_features=spec.num_bands, gather_impl=impl,
                          stack_nets=args.stack_nets)
        sampler = SemiSupervisedSampler(
            splits, scene.labels, cfg.labeled_batch, cfg.unlabeled_batch,
            num_unlabel=cfg.num_unlabel)
        mesh = None if args.no_mesh else create_mesh()
        trainer = CMLPLTrainer(cfg, mesh=mesh)
        steps = cfg.num_epochs * (cfg.num_unlabel // cfg.labeled_batch)

        state = trainer.init_state(jax.random.key(0, impl="rbg"))
        t0 = time.perf_counter()
        state, metrics = trainer.train_run(state, scene, sampler)
        acc0 = sync(metrics)
        compile_sec = time.perf_counter() - t0

        times = []
        for r in range(args.repeats):
            state = trainer.init_state(jax.random.key(1 + r, impl="rbg"))
            t0 = time.perf_counter()
            state, metrics = trainer.train_run(state, scene, sampler)
            acc = sync(metrics)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(json.dumps({
            "impl": impl,
            "stack_nets": args.stack_nets,
            "train_sec": round(dt, 3),
            "train_sec_all": [round(t, 3) for t in times],
            "patches_per_sec": round(
                steps * (cfg.labeled_batch + cfg.unlabeled_batch) / dt, 1),
            "final_train_acc": round(acc, 4),
            "compile_plus_first_run_sec": round(compile_sec, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
