"""A/B: dense dilated whole-scene eval vs tiled patch gathers, real TPU.

--dataID selects the scene geometry (registry dims; synthetic cube —
throughput depends on shapes, not pixel values).  --algo cct runs the
CCT eval path (dec_base(encoder(xp, x))) through the same modes via the
dense params view.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                            prepare_scene, synthetic_scene)
from cmlpl_tpu.eval import ScenePredictor
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

p = argparse.ArgumentParser()
p.add_argument("--dataID", type=int, default=1)
p.add_argument("--algo", choices=["cmlpl", "cct"], default="cmlpl")
p.add_argument("--repeats", type=int, default=3)
args = p.parse_args()

spec = get_dataset(args.dataID)
cube, gt = synthetic_scene(spec, rows=spec.rows, cols=spec.cols)
scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
splits = generate_splits(scene.labels, num_label=5)

cfg = CMLPLConfig(num_classes=spec.num_classes, num_features=spec.num_bands,
                  num_epochs=2, gather_impl="pool")
sampler = SemiSupervisedSampler(splits, scene.labels, cfg.labeled_batch,
                                cfg.unlabeled_batch,
                                num_unlabel=cfg.num_unlabel)
mesh = create_mesh()
if args.algo == "cct":
    from cmlpl_tpu.train.cct import CCTTrainer

    trainer = CCTTrainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.key(0, impl="rbg"))
    state, m = trainer.train_run(state, scene, sampler)
    float(np.asarray(m["acc"]).ravel()[-1])  # sync
    params = jax.device_get(state.params)
    enc, head = trainer.encoder, trainer.head

    def apply_b(p, xp, x):
        fea, _ = enc.apply({"params": p["encoder"]}, xp, x, train=False)
        return head.apply({"params": p["dec_base"]}, fea)
else:
    trainer = CMLPLTrainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.key(0, impl="rbg"))
    state, m = trainer.train_run(state, scene, sampler)
    float(np.asarray(m["acc"]).ravel()[-1])  # sync
    params = state.net_b.params
    model = trainer.model

    def apply_b(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]


results = {"dataID": args.dataID, "algo": args.algo,
           "pixels": scene.num_pixels}
preds = {}
for gather in ["xla", "pallas", "pallas_bf16", "dense"]:
    pr = ScenePredictor(apply_b, patch_size=20, cols=scene.cols,
                        tile=4096, mesh=mesh, gather=gather)
    pr(params, scene)  # compile
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = pr(params, scene)
        times.append(time.perf_counter() - t0)
    preds[gather] = out
    results[gather] = {"min": round(min(times), 4),
                       "all": [round(t, 4) for t in times]}

for g in ["pallas", "pallas_bf16", "dense"]:
    results[g]["agree_vs_xla"] = round(
        float(np.mean(preds[g] == preds["xla"])), 5)
print(json.dumps(results, indent=1))
