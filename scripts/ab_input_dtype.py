"""A/B the input_dtype knob on the real TPU (r3c).

With ``compute_dtype=bfloat16`` the model layers cast their inputs to
bf16 internally, but until r3c the gathered patch pool, the per-step row
takes, and the 8 Gaussian-noise views all lived in f32 — ~196 MB/step of
read+write elementwise traffic at the reference schedule (the r3 profile
attributes 18% of device time to elementwise fusions).  input_dtype
"compute" stores them in bf16 instead, halving those bytes; "float32"
reproduces the pre-r3c behaviour.

Arms are interleaved round-robin in ONE process (chip drift makes
sequential blocks non-decision-grade; CLAUDE.md).  Each arm runs the
full fused 20-epoch training run with pool gather + rbg (the headline
stack).  Prints one JSON line per arm.

Usage: python scripts/ab_input_dtype.py [--algo cmlpl|cps|cct]
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
    p.add_argument("--algo", default="cmlpl",
                   choices=["cmlpl", "cps", "cct"])
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--gather_impl", default="pool")
    args = p.parse_args()

    from cmlpl_tpu.core.mesh import create_mesh
    from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                                prepare_scene, synthetic_scene)
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer
    from cmlpl_tpu.train.cct import CCTTrainer
    from cmlpl_tpu.train.cps import CPSTrainer

    trainer_cls = {"cmlpl": CMLPLTrainer, "cps": CPSTrainer,
                   "cct": CCTTrainer}[args.algo]

    spec = get_dataset(1)
    cube, gt = synthetic_scene(spec, rows=ROWS, cols=COLS)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
    splits = generate_splits(scene.labels, num_label=5)

    def sync(metrics):
        # device->host fetch: the only honest barrier over the tunnel
        return float(np.asarray(metrics["acc"]).ravel()[-1])

    mesh = create_mesh()
    arms = []
    for name, input_dtype in (("f32_inputs", "float32"),
                              ("bf16_inputs", "compute")):
        cfg = CMLPLConfig(num_classes=spec.num_classes,
                          num_features=spec.num_bands,
                          gather_impl=args.gather_impl,
                          compute_dtype="bfloat16",
                          input_dtype=input_dtype)
        sampler = SemiSupervisedSampler(
            splits, scene.labels, cfg.labeled_batch, cfg.unlabeled_batch,
            num_unlabel=cfg.num_unlabel)
        trainer = trainer_cls(cfg, mesh=mesh)
        arms.append({"name": name, "cfg": cfg, "trainer": trainer,
                     "sampler": sampler, "times": [], "acc": 0.0})

    # warm (compile + first run) each arm
    for a in arms:
        st = a["trainer"].init_state(jax.random.key(0, impl="rbg"))
        _, m = a["trainer"].train_run(st, scene, a["sampler"])
        sync(m)

    for r in range(args.repeats):
        for a in arms:
            st = a["trainer"].init_state(jax.random.key(1 + r, impl="rbg"))
            t0 = time.perf_counter()
            _, m = a["trainer"].train_run(st, scene, a["sampler"])
            a["acc"] = sync(m)
            a["times"].append(time.perf_counter() - t0)

    cfg0 = arms[0]["cfg"]
    steps = cfg0.num_epochs * (cfg0.num_unlabel // cfg0.labeled_batch)
    for a in arms:
        dt = min(a["times"])
        print(json.dumps({
            "algo": args.algo,
            "arm": a["name"],
            "gather_impl": args.gather_impl,
            "train_sec": round(dt, 3),
            "train_sec_all": [round(t, 3) for t in a["times"]],
            "patches_per_sec": round(
                steps * (cfg0.labeled_batch + cfg0.unlabeled_batch) / dt,
                1),
            "final_train_acc": round(a["acc"], 4),
        }), flush=True)


if __name__ == "__main__":
    main()
