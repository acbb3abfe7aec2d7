"""A/B: dense dilated whole-scene eval vs tiled patch gathers, real TPU."""
import json
import time

import jax
import numpy as np

from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                            prepare_scene, synthetic_scene)
from cmlpl_tpu.eval import ScenePredictor
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

spec = get_dataset(1)
cube, gt = synthetic_scene(spec, rows=610, cols=340)
scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
splits = generate_splits(scene.labels, num_label=5)

cfg = CMLPLConfig(num_classes=spec.num_classes, num_features=spec.num_bands,
                  num_epochs=2, gather_impl="pool")
sampler = SemiSupervisedSampler(splits, scene.labels, cfg.labeled_batch,
                                cfg.unlabeled_batch,
                                num_unlabel=cfg.num_unlabel)
mesh = create_mesh()
trainer = CMLPLTrainer(cfg, mesh=mesh)
state = trainer.init_state(jax.random.key(0, impl="rbg"))
state, m = trainer.train_run(state, scene, sampler)
float(np.asarray(m["acc"]).ravel()[-1])  # sync
params = state.net_b.params
model = trainer.model


def apply_b(p, xp, x):
    return model.apply({"params": p}, xp, x, train=False)[0]


results = {}
preds = {}
for gather in ["xla", "pallas", "pallas_bf16", "dense"]:
    pr = ScenePredictor(apply_b, patch_size=20, cols=scene.cols,
                        tile=4096, mesh=mesh, gather=gather)
    pr(params, scene)  # compile
    times = []
    for _ in range(3):
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
