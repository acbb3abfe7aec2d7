"""Native TRAINING A/B: the C++ PJRT host runs the whole fused training
run vs trainer.train_run in-process — on the real TPU, bit-exact.

The reference can only train by executing its Python scripts
(train.py:65-353).  Here the entire multi-epoch schedule is ONE
functional XLA program (EpochDriver whole-run scan), exported as a raw
StableHLO bundle (utils/export.build_run_exported): Python prepares the
scene + init state + pre-drawn schedule once, then the standalone host
binary trains with no Python in the loop and writes the final state +
per-step metrics as .npy.

Hermetic halves already pinned in CI:
  - exported program == train_run numerics (tests/test_export.py::
    test_run_export_matches_train_run, CPU bit-exact)
  - host N-ary PJRT plumbing (tests/test_native_host.py::
    test_train_bundle_native_host_stub, stub plugin)
This script closes the loop on hardware: the same comparison through the
real plugin/chip.  Prints one JSON line.

    python scripts/native_train_ab.py --num_epochs 5
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cmlpl_tpu.data import (  # noqa: E402
    SemiSupervisedSampler,
    generate_splits,
    prepare_scene,
    synthetic_scene,
)
from cmlpl_tpu.native.pjrt_launcher import (  # noqa: E402
    build_host,
    client_options,
    discover_plugin,
    plugin_env,
)
from cmlpl_tpu.registry import get_dataset  # noqa: E402
from cmlpl_tpu.train import CMLPLTrainer  # noqa: E402
from cmlpl_tpu.train.state import CMLPLConfig  # noqa: E402
from cmlpl_tpu.utils.export import (  # noqa: E402
    build_run_exported,
    save_run_bundle,
)
from cmlpl_tpu.utils.tunnel import require_tunnel  # noqa: E402

require_tunnel()

p = argparse.ArgumentParser()
p.add_argument("--dataID", type=int, default=1)
p.add_argument("--num_epochs", type=int, default=5)
p.add_argument("--num_unlabel", type=int, default=2048)
p.add_argument("--batch", type=int, default=64)
p.add_argument("--seed", type=int, default=1088)
p.add_argument("--workdir", default="/tmp/native_train_ab")
args = p.parse_args()

spec = get_dataset(args.dataID)
cube, gt = synthetic_scene(spec, rows=spec.rows, cols=spec.cols)
scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
splits = generate_splits(scene.labels, num_label=5)

cfg = CMLPLConfig(num_classes=spec.num_classes,
                  num_features=spec.num_bands, n_pc=60,
                  labeled_batch=args.batch, unlabeled_batch=args.batch,
                  num_epochs=args.num_epochs,
                  num_unlabel=args.num_unlabel)


def sampler():
    # fresh instance per side: same seed -> identical schedule draws
    return SemiSupervisedSampler(splits, scene.labels, args.batch,
                                 args.batch,
                                 num_unlabel=args.num_unlabel,
                                 seed=args.seed)


trainer = CMLPLTrainer(cfg)
rng = jax.random.key(args.seed)

os.makedirs(args.workdir, exist_ok=True)
bundle = os.path.join(args.workdir, "bundle")
outdir = os.path.join(args.workdir, "out")
os.makedirs(outdir, exist_ok=True)
t0 = time.time()
meta, exported, inputs = build_run_exported(trainer, scene, sampler(),
                                            rng, platforms=["tpu"])
save_run_bundle(bundle, meta, exported, inputs)
export_sec = time.time() - t0

host = build_host()
plugin = discover_plugin()
assert host and plugin, (host, plugin)
cmd = [host, "--plugin", plugin, "--bundle", bundle,
       "--inputs", os.path.join(bundle, "inputs"),
       "--outdir", outdir] + client_options(plugin)
print("exec:", " ".join(cmd), file=sys.stderr, flush=True)
proc = subprocess.run(cmd, env=plugin_env(plugin), capture_output=True,
                      text=True, timeout=3600)
print(proc.stderr, file=sys.stderr)
if proc.returncode != 0:
    raise SystemExit(f"pjrt_host failed rc={proc.returncode}")
host_stats = json.loads(proc.stdout.strip().splitlines()[-1])

# In-process reference: same init state, same schedule, same program.
t0 = time.time()
state, metrics = trainer.train_run(trainer.init_state(rng), scene,
                                   sampler())
state, metrics = jax.device_get((state, metrics))  # honest sync
inproc_sec = time.time() - t0

import jax.random as jrandom  # noqa: E402

ref = [jrandom.key_data(l)
       if jnp.issubdtype(l.dtype, jax.dtypes.prng_key) else np.asarray(l)
       for l in jax.tree_util.tree_leaves(state)]
ref += [np.asarray(v) for _, v in
        jax.tree_util.tree_flatten_with_path(metrics)[0]]

max_abs = 0.0
exact = 0
for name, r in zip(meta["output_names"], ref):
    got = np.load(os.path.join(outdir, name + ".npy"))
    if got.tobytes() == np.asarray(r).tobytes():
        exact += 1
    else:
        d = np.max(np.abs(got.astype(np.float64)
                          - np.asarray(r, np.float64)))
        max_abs = max(max_abs, float(d))

n = len(ref)

# the full workflow: import the host-trained state and score its OA on
# the test split (utils/export.load_run_outputs -> ScenePredictor)
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy  # noqa: E402
from cmlpl_tpu.utils.export import load_run_outputs  # noqa: E402

template = jax.device_get(trainer.init_state(rng))
host_state, _ = load_run_outputs(bundle, outdir, template)
model = trainer.model


def apply_b(pr, xp, x):
    return model.apply({"params": pr}, xp, x, train=False)[0]


predictor = ScenePredictor(apply_b, patch_size=cfg.patch_size,
                           cols=scene.cols, tile=cfg.val_batch)
pred = np.asarray(predictor(host_state.net_b.params, scene))
y_test = scene.labels[splits.test] - 1
oa = float(cal_accuracy(pred[splits.test], y_test).oa)

print(json.dumps({
    "dataset": spec.name, "epochs": args.num_epochs,
    "steps": args.num_epochs * meta["batches_per_epoch"],
    "export_sec": round(export_sec, 2),
    "host": host_stats,
    "inprocess_train_sec": round(inproc_sec, 2),
    "outputs_bitexact": f"{exact}/{n}",
    "max_abs_diff": max_abs,
    "host_trained_oa": round(oa * 100, 2),
}))
if exact != n:
    raise SystemExit("native host training DIVERGES from train_run")
