"""Native serving A/B: the C++ PJRT host vs the in-process predictor.

Exports the whole-scene predictor as a raw StableHLO bundle
(utils/export.save_native_bundle), feeds the scene to the standalone
pjrt_host binary through the axon tunnel plugin, and checks the returned
class map bit-for-bit against eval.ScenePredictor on the same weights —
the no-Python-serving-path claim, executed rather than asserted.

Runs on the real TPU (the only PJRT plugin this image can load).  The
reference has no deployment story to A/B against (train.py:291-309 runs
eval inline); the honest comparison is our own warm-process serving
path, so the JSON reports both: host run_ms (buffers in, execute, labels
out) and the in-process predictor's device time.

    python scripts/native_serve_ab.py --dataID 1 --repeats 3
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from cmlpl_tpu.data import prepare_scene, synthetic_scene
from cmlpl_tpu.eval import ScenePredictor
from cmlpl_tpu.models import BaseNet2
from cmlpl_tpu.native.pjrt_launcher import (build_host, client_options,
                                            discover_plugin, plugin_env)
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.utils.export import build_exported, save_native_bundle
from cmlpl_tpu.utils.tunnel import require_tunnel

require_tunnel()  # fail fast instead of hanging if the relay is down

p = argparse.ArgumentParser()
p.add_argument("--dataID", type=int, default=1)
p.add_argument("--repeats", type=int, default=3)
p.add_argument("--gather", choices=["xla", "dense"], default="xla")
p.add_argument("--tile", type=int, default=4096)
p.add_argument("--workdir", default="/tmp/native_serve_ab")
args = p.parse_args()

spec = get_dataset(args.dataID)
cube, gt = synthetic_scene(spec, rows=spec.rows, cols=spec.cols)
scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)

model = BaseNet2(num_features=spec.num_bands, num_classes=spec.num_classes,
                 n_pc=scene.n_pc)
xp0 = np.zeros((1, scene.patch_size, scene.patch_size, scene.n_pc),
               np.float32)
x0 = np.zeros((1, spec.num_bands), np.float32)
params = model.init(jax.random.key(3), xp0, x0, train=False)["params"]


def apply_fn(pr, xp, x):
    return model.apply({"params": pr}, xp, x, train=False)[0]


os.makedirs(args.workdir, exist_ok=True)
bundle = os.path.join(args.workdir, "bundle")
t0 = time.time()
meta, exported = build_exported(apply_fn, params, scene,
                                gather=args.gather, tile=args.tile,
                                platforms=["tpu"])
save_native_bundle(bundle, meta, exported)
export_sec = time.time() - t0

cube_npy = os.path.join(args.workdir, "cube.npy")
spectra_npy = os.path.join(args.workdir, "spectra.npy")
out_npy = os.path.join(args.workdir, "pred.npy")
np.save(cube_npy, np.asarray(scene.padded_pca, np.float32))
np.save(spectra_npy, np.asarray(scene.spectra, np.float32))

host = build_host()
plugin = discover_plugin()
assert host and plugin, (host, plugin)
cmd = [host, "--plugin", plugin, "--bundle", bundle, "--cube", cube_npy,
       "--spectra", spectra_npy, "--out", out_npy,
       "--repeat", str(args.repeats)] + client_options(plugin)
print("exec:", " ".join(cmd), file=sys.stderr, flush=True)
proc = subprocess.run(cmd, env=plugin_env(plugin), capture_output=True,
                      text=True, timeout=1800)
print(proc.stderr, file=sys.stderr)
if proc.returncode != 0:
    raise SystemExit(f"pjrt_host failed rc={proc.returncode}")
host_stats = json.loads(proc.stdout.strip().splitlines()[-1])
native_pred = np.load(out_npy)

# In-process comparison on the same weights (warm Python serving path).
predictor = ScenePredictor(apply_fn, patch_size=scene.patch_size,
                           cols=scene.cols, tile=args.tile,
                           gather=args.gather)
ref = np.asarray(predictor(params, scene))   # compile + run
times = []
for _ in range(args.repeats):
    t0 = time.time()
    r = predictor(params, scene)
    _ = np.asarray(r)                        # honest device->host sync
    times.append(time.time() - t0)

agree = float(np.mean(native_pred == ref))
print(json.dumps({
    "dataset": spec.name, "pixels": scene.num_pixels,
    "gather": args.gather, "export_sec": round(export_sec, 2),
    "host": host_stats,
    "inprocess_run_ms_min": round(min(times) * 1e3, 2),
    "agreement": agree,
}))
if agree != 1.0:
    raise SystemExit("native host output DIVERGES from in-process predictor")
