"""A/B the noise-view knobs on the real TPU (VERDICT r3 item 4).

The r3 fused-run profile puts ~18% of device time on elementwise work
dominated by Gaussian view generation (train.py:157-184 semantics:
8 draws over full-size view tensors per step).  Analysis first
(ops/noise.py module docstring): per-epoch pre-noised pools are a
no-win (each unlabeled sample is visited ~once per epoch, so the draw
count is unchanged) and erfinv is compute-trivial — the plausible
levers are RNG-kernel count and bit volume.  Candidates, all opt-in
knobs (they change the realised stream like rng_impl; OA study via
reference_oracle --ours_flags):

  baseline       the bench.py fast stack (pool + rbg + bf16)
  fused          --noise_fused: 4 RNG kernels/step instead of 8
  binom16        --noise_impl binom16: popcount Gaussian, no erfinv
  fused_binom16  both

Protocol: interleaved same-process rounds (the chip drifts across
hours; only interleaved A/Bs are decision-grade — CLAUDE.md), honest
device->host sync, min-of-rounds per variant.  Prints one JSON line per
variant plus a verdict line.
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

from cmlpl_tpu.utils.cache import enable_compile_cache  # noqa: E402

# hardware windows are scarce (relay outage log in CLAUDE.md): reuse the
# repo-local compile cache so an A/B session measures instead of
# recompiling — the cached executables run identical numerics.
enable_compile_cache()

ROWS, COLS = 610, 340

VARIANTS = {
    "baseline": {},
    "fused": {"noise_fused": True},
    "binom16": {"noise_impl": "binom16"},
    "fused_binom16": {"noise_fused": True, "noise_impl": "binom16"},
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", nargs="+", default=list(VARIANTS),
                   choices=list(VARIANTS))
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved timed rounds (after compile runs)")
    p.add_argument("--f32", action="store_true",
                   help="run at reference numerics (threefry + f32) "
                        "instead of the fast stack")
    p.add_argument("--rows", type=int, default=ROWS)
    p.add_argument("--cols", type=int, default=COLS)
    p.add_argument("--num_epochs", type=int, default=None,
                   help="override CMLPLConfig.num_epochs (mechanics "
                        "checks; timings are only meaningful at the "
                        "default schedule)")
    p.add_argument("--cpu", action="store_true",
                   help="mechanics check on host CPU: forces "
                        "jax_platforms=cpu and skips the tunnel "
                        "preflight. Timings are meaningless; use tiny "
                        "--rows/--cols/--num_epochs.")
    args = p.parse_args()

    if args.cpu:
        # before any backend init (the image's sitecustomize otherwise
        # registers the tunneled TPU backend — CLAUDE.md gotcha 1)
        jax.config.update("jax_platforms", "cpu")

    from cmlpl_tpu.core.mesh import create_mesh
    from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                                prepare_scene, synthetic_scene)
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer
    from cmlpl_tpu.utils.tunnel import require_tunnel

    if not args.cpu:
        require_tunnel()

    spec = get_dataset(1)
    cube, gt = synthetic_scene(spec, rows=args.rows, cols=args.cols)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
    splits = generate_splits(scene.labels, num_label=5)
    fast = ({} if args.f32 else
            dict(rng_impl="rbg", compute_dtype="bfloat16"))
    key_impl = "threefry2x32" if args.f32 else "rbg"

    def sync(metrics):
        # device->host fetch: the only honest barrier over the tunnel
        return float(np.asarray(metrics["acc"]).ravel()[-1])

    mesh = create_mesh()
    overrides = {}
    if args.num_epochs is not None:
        overrides["num_epochs"] = args.num_epochs
    if args.cpu:
        # tiny scenes can hold fewer unlabeled pixels than the
        # reference default schedule assumes; below one full batch the
        # schedule would be 0 steps and the A/B would exercise nothing
        n_unlab = len(splits.unlabeled)
        if n_unlab < 64:
            raise SystemExit(
                f"scene holds only {n_unlab} unlabeled pixels "
                f"(< one 64-patch batch); use a larger --rows/--cols")
        overrides["num_unlabel"] = min(2048, (n_unlab // 64) * 64)
    runs = {}
    for name in args.variants:
        cfg = CMLPLConfig(num_classes=spec.num_classes,
                          num_features=spec.num_bands,
                          gather_impl="pool", **fast, **overrides,
                          **VARIANTS[name])
        sampler = SemiSupervisedSampler(
            splits, scene.labels, cfg.labeled_batch, cfg.unlabeled_batch,
            num_unlabel=cfg.num_unlabel)
        trainer = CMLPLTrainer(cfg, mesh=mesh)
        state = trainer.init_state(jax.random.key(0, impl=key_impl))
        t0 = time.perf_counter()
        state, metrics = trainer.train_run(state, scene, sampler)
        sync(metrics)
        runs[name] = {"trainer": trainer, "sampler": sampler,
                      "cfg": cfg, "times": [], "acc": [],
                      "compile_sec": time.perf_counter() - t0}

    for r in range(args.rounds):  # interleave: one run per variant/round
        for name in args.variants:
            ru = runs[name]
            state = ru["trainer"].init_state(
                jax.random.key(1 + r, impl=key_impl))
            t0 = time.perf_counter()
            state, metrics = ru["trainer"].train_run(state, scene,
                                                     ru["sampler"])
            ru["acc"].append(sync(metrics))
            ru["times"].append(time.perf_counter() - t0)

    base = min(runs[args.variants[0]]["times"])
    for name in args.variants:
        ru = runs[name]
        cfg = ru["cfg"]
        steps = cfg.num_epochs * (cfg.num_unlabel // cfg.labeled_batch)
        dt = min(ru["times"])
        print(json.dumps({
            "variant": name, "stack": "f32" if args.f32 else "fast",
            "train_sec": round(dt, 3),
            "train_sec_all": [round(t, 3) for t in ru["times"]],
            "patches_per_sec": round(
                steps * (cfg.labeled_batch + cfg.unlabeled_batch) / dt, 1),
            "vs_first_variant": round(base / dt, 4),
            "final_train_acc": round(float(np.mean(ru["acc"])), 4),
            "compile_plus_first_run_sec": round(ru["compile_sec"], 1),
        }), flush=True)


if __name__ == "__main__":
    main()
