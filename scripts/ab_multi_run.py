"""A/B the fused multi-seed run vs the serial --num_iters loop (real TPU).

The reference repeats its entire training loop serially per iteration
(train.py:72 ``for index_iter in range(num_iters)``) to report mean±std
OA.  ``EpochDriver.train_multi_run`` instead vmaps the whole-run dispatch
over a seed axis (results identical to the serial loop; pinned by
tests/test_multi_run.py).  On a mesh the seed axis shards over ``data``
(N seeds on N chips ≈ one run's wall time); this script measures the
single-chip question: does one vmapped N-seed dispatch beat N serial
fused-run dispatches, or does the grouped-conv lowering (the recorded
``stack_nets`` dead-end, -7.5%) eat the dispatch savings?

Protocol: one process, arms interleaved round-robin (the chip drifts
hour-scale; sequential blocks are not decision-grade), honest
device->host sync.  Prints one JSON line per arm.
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

from cmlpl_tpu.utils.tunnel import require_tunnel  # noqa: E402

require_tunnel()  # fail fast instead of hanging if the relay is down

ROWS, COLS = 610, 340


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num_iters", type=int, default=4)
    p.add_argument("--repeats", type=int, default=3,
                   help="timed repeats per arm (after the compile run)")
    p.add_argument("--fast_stack", action="store_true",
                   help="pool+rbg+bf16 (the bench.py headline config)")
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

    kw = {}
    rng_impl = "threefry2x32"
    if args.fast_stack:
        kw = dict(compute_dtype="bfloat16")
        rng_impl = "rbg"
    cfg = CMLPLConfig(num_classes=spec.num_classes,
                      num_features=spec.num_bands, **kw)

    def mk_sampler(seed=0):
        return SemiSupervisedSampler(
            splits, scene.labels, cfg.labeled_batch, cfg.unlabeled_batch,
            num_unlabel=cfg.num_unlabel, seed=seed)

    mesh = create_mesh()
    trainer = CMLPLTrainer(cfg, mesh=mesh)
    n = args.num_iters
    steps = cfg.num_epochs * (cfg.num_unlabel // cfg.labeled_batch)

    def sync_metrics(metrics):
        return float(np.asarray(metrics["acc"]).ravel()[-1])

    def serial(rng):
        accs = []
        sampler = mk_sampler()
        for i in range(n):
            st = trainer.init_state(jax.random.fold_in(rng, i))
            st, metrics = trainer.train_run(st, scene, sampler)
            accs.append(metrics)
        return sum(sync_metrics(m) for m in accs)

    def fused(rng):
        ms, metrics = trainer.train_multi_run(rng, scene, mk_sampler(), n)
        return float(np.asarray(metrics["acc"])[:, -1, -1].sum())

    arms = {"serial": serial, "fused": fused}
    # compile runs
    compile_sec = {}
    for name, fn in arms.items():
        t0 = time.perf_counter()
        fn(jax.random.key(0, impl=rng_impl))
        compile_sec[name] = time.perf_counter() - t0

    times = {name: [] for name in arms}
    for r in range(args.repeats):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn(jax.random.key(1 + r, impl=rng_impl))
            times[name].append(time.perf_counter() - t0)

    for name in arms:
        dt = min(times[name])
        print(json.dumps({
            "arm": name,
            "num_iters": n,
            "fast_stack": args.fast_stack,
            "total_sec": round(dt, 3),
            "total_sec_all": [round(t, 3) for t in times[name]],
            "sec_per_seed": round(dt / n, 3),
            "patches_per_sec_per_seed": round(
                steps * (cfg.labeled_batch + cfg.unlabeled_batch)
                * n / dt, 1),
            "compile_plus_first_sec": round(compile_sec[name], 1),
        }), flush=True)


if __name__ == "__main__":
    main()
