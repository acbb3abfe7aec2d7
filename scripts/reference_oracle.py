"""Reference-in-the-loop OA A/B (VERDICT r2 item 1).

Runs the reference's UNMODIFIED training mains (/root/reference/train.py:65,
trian_CPS.py, trian_CCT.py) on this host's CPU torch against a
materialised synthetic scene in the reference's own .npy layout, and the
same schedule through cmlpl_tpu's CLIs on JAX CPU — same scene bytes, same
split arrays, same hyperparameters, N seeds each.  This closes the residual
risk the transplant oracles (tests/test_full_step_torch_parity.py etc.)
cannot: they validate this repo's *reading* of train.py, while here
train.py validates itself end-to-end (HSIDataSet tiling at runtime sizes,
DataLoader shuffling, queue pointer wraparound, the test_whole eval tail).

Environment shims (absence-of-CUDA / missing-module only; ZERO reference
algorithm lines are touched):
  - sys.modules stubs: ``regularizer`` (missing from the reference repo —
    trian_CPS.py:11 imports it, :163 constructs Distribution_Loss, never
    invokes it), ``hdf5storage`` (Indian Pines loader only,
    hyper_tools.py:269), ``torchvision`` (imported by tools/models.py:6,
    never used)
  - torch.Tensor.cuda / torch.nn.Module.cuda -> identity (CPU torch image)
  - module-level ``DrawResult`` -> stub (hard-codes 610x340 scene dims,
    hyper_tools.py:58-205; plotting tail only)
  - module-level ``CalAccuracy`` wrapped to RECORD (OA, Kappa, producerA)
    (the reference only prints them, train.py:298-306)

Scene: the deterministic PaviaU-shaped synthetic scene (dataID 0: 9
classes, 103 bands, 64x48) materialised by cli/sample_generation
--materialize_patches into ./dataset/PaviaU/ so the reference's
hard-coded dataID=1 paths (train.py:75-78, hsi_loader.py:8-9) find it.

Default schedule (reduced for 1-vCPU torch): 10 epochs x 32 batches of
64+64, num_unlabel=2048 — exactly 32 FULL batches per epoch, so the two
sides' schedules agree (with a partial last batch the rebuild drops it;
documented divergence, data/pipeline.py).

Usage:  python scripts/reference_oracle.py [--algos cmlpl cps cct]
        [--seeds 3] [--workdir ./refab]
Prints ONE JSON line per algorithm (both OA distributions + an overlap
verdict) and a summary line; also writes <workdir>/reference_ab.json.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time
import types

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
REFERENCE = os.environ.get("CMLPL_REFERENCE", "/root/reference")

os.environ.setdefault("MPLBACKEND", "Agg")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from cmlpl_tpu.utils.cache import enable_compile_cache  # noqa: E402

# the ours-side CLI mains compile the fused run in-process; on this
# 1-vCPU host that cold compile is minutes — cache it so killed/resumed
# multi-seed sessions (see the .partial.json banking) don't re-pay it
enable_compile_cache()


# --------------------------------------------------------------------- #
# shims
# --------------------------------------------------------------------- #
def install_shims() -> None:
    import torch

    if "regularizer" not in sys.modules:
        mod = types.ModuleType("regularizer")

        class Distribution_Loss(torch.nn.Module):
            """Stand-in for the module missing from the reference repo
            (trian_CPS.py:11).  Constructed with loss='mmd' at
            trian_CPS.py:163 and never invoked; forward implements a
            plain RBF MMD so even an unexpected call stays meaningful
            (full capability: cmlpl_tpu/objectives/mmd.py)."""

            def __init__(self, loss: str = "mmd"):
                super().__init__()
                self.loss_name = loss

            def forward(self, a, b):
                z = torch.cat([a, b], dim=0)
                d2 = torch.cdist(z, z) ** 2
                k = torch.exp(-d2 / (2.0 * d2.median().clamp_min(1e-8)))
                n = a.shape[0]
                return (k[:n, :n].mean() + k[n:, n:].mean()
                        - 2.0 * k[:n, n:].mean())

        mod.Distribution_Loss = Distribution_Loss
        sys.modules["regularizer"] = mod

    if "hdf5storage" not in sys.modules:
        h5 = types.ModuleType("hdf5storage")

        def _loadmat(*a, **k):
            raise RuntimeError("hdf5storage stub: Indian Pines .mat "
                               "loading is not part of this A/B")

        h5.loadmat = _loadmat
        sys.modules["hdf5storage"] = h5

    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")

    # CPU image: .cuda() becomes identity
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def reference_args(args, dataID: int = 1) -> argparse.Namespace:
    """The reference scripts' full flag set (train.py:355-380 ==
    trian_CPS.py:334-365 == trian_CCT.py:290-322), at our schedule.
    dataID is an INT: the scripts compare `args.dataID == 1`
    (their `type=str` default would crash any CLI-passed value)."""
    return argparse.Namespace(
        dataID=dataID, num_label=args.num_label, save_path_prefix="./",
        labeled_batch_size=args.labeled_batch_size,
        unlabeled_batch_size=args.unlabeled_batch_size,
        val_batch_size=args.val_batch_size, num_workers=0,
        lr=args.lr, num_epochs=args.num_epochs,
        print_per_batches=10_000_000,  # silence per-batch prints
        num_unlabel=args.num_unlabel, thr=1.0, alpha=0.95,
        queue_batch=17, temperature=0.3, teacher_alpha=0.95,
        dropout=args.dropout, noise=0.5, m=5)


_REF_MODULES = {"cmlpl": "train", "cps": "trian_CPS", "cct": "trian_CCT"}


def config_fingerprint(args, side: str) -> dict:
    """Config identity stamped into the per-seed partial files.

    The partials are keyed only by workdir+algo on disk; without this,
    rerunning in the same workdir with a different --seed0 / --geometry
    / scene recipe / --ours_flags would silently resume and mix OA
    values from incompatible configurations into one distribution
    (advisor finding, r4)."""
    fp = {
        "seed0": args.seed0, "geometry": args.geometry,
        "rows": args.rows, "cols": args.cols,
        "noise_std": args.noise_std, "class_sep": args.class_sep,
        "num_label": args.num_label, "num_epochs": args.num_epochs,
        "labeled_batch_size": args.labeled_batch_size,
        "unlabeled_batch_size": args.unlabeled_batch_size,
        "num_unlabel": args.num_unlabel,
        "dropout": args.dropout, "lr": args.lr,
    }
    if side == "ours":
        fp["ours_flags"] = list(args.ours_flags)
        # platform is provenance: same config on CPU XLA vs TPU draws
        # from the same OA distribution but the values differ per seed;
        # a TPU session must not silently extend a CPU-banked partial
        fp["ours_tpu"] = bool(getattr(args, "ours_tpu", False))
    return fp


def resume_partial(partial_path: str, fp: dict, tag: str):
    """Load banked seeds from a partial file, refusing a config mismatch.

    Returns (oa_a, oa_b, sec_per_seed).  Legacy partials written before
    fingerprinting resume with a warning; a partial carrying a DIFFERENT
    fingerprint raises (use a fresh --workdir instead of mixing)."""
    if not os.path.exists(partial_path):
        return [], [], []
    with open(partial_path) as f:
        prev = json.load(f)
    prev_fp = prev.get("fingerprint")
    if prev_fp is not None and prev_fp != fp:
        raise RuntimeError(
            f"{partial_path} was banked under a different configuration;"
            f" refusing to mix distributions.\n"
            f"  banked:  {prev_fp}\n  current: {fp}\n"
            f"Use a fresh --workdir (or delete the partial).")
    if prev_fp is None:
        print(f"[{tag}] WARNING: resuming legacy partial without a "
              f"config fingerprint: {partial_path}", file=sys.stderr)
    print(f"[{tag}] resuming: {len(prev['oa_a'])} seeds banked in "
          f"{partial_path}", file=sys.stderr)
    return prev["oa_a"], prev["oa_b"], prev["sec_per_seed"]


def bank_partial(partial_path: str, fp: dict, oa_a, oa_b, secs) -> None:
    tmp = partial_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"oa_a": oa_a, "oa_b": oa_b, "sec_per_seed": secs,
                   "fingerprint": fp}, f)
    os.replace(tmp, partial_path)

#: A/B scene geometries.  Each entry picks the registry spec whose
#: (num_classes, num_bands) the synthetic scene copies, the dataID our
#: CLIs run with, and the reference's hard-coded dataID + dataset dir
#: (train.py:75-90, hsi_loader.py:8-17) the materialised .npy set must
#: appear under.  The scene ITSELF stays the small hard-recipe synthetic
#: (rows/cols/noise_std/class_sep flags) — geometry varies the
#: class-count/band-count axis the PaviaU shape can't.
GEOMETRIES = {
    "paviau": {"syn_spec": 0, "ours_id": "0", "ref_id": 1,
               "dirname": "PaviaU"},      # 9 classes, 103 bands
    "salinas": {"syn_spec": 2, "ours_id": "2", "ref_id": 2,
                "dirname": "Salinas"},    # 16 classes, 204 bands
    "houston": {"syn_spec": 3, "ours_id": "3", "ref_id": 3,
                "dirname": "Houston"},    # 15 classes, 144 bands
    # Indian Pines trains from the same materialised .npy set — the
    # reference's hdf5storage loader (stubbed) is only for raw .mat prep
    "indian": {"syn_spec": 4, "ours_id": "4", "ref_id": 4,
               "dirname": "Indian_pines"},  # 16 classes, 200 bands
}


def run_reference(algo: str, args, workdir: str) -> dict:
    """Execute the reference main() N times; returns OA lists + timing."""
    install_shims()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        mod = importlib.import_module(_REF_MODULES[algo])
        # plotting tail stubs: DrawResult hard-codes the real scenes'
        # dims and would crash on the 64x48 A/B scene
        mod.DrawResult = lambda labels, dataID: np.zeros((4, 4, 3),
                                                         np.float32)
        records: list = []
        orig_cal = mod.CalAccuracy

        def recording_cal(pred, y):
            out = orig_cal(pred, y)
            records.append(out)
            return out

        mod.CalAccuracy = recording_cal

        # per-seed banking, mirroring run_ours: reference seeds cost
        # 117-402 s each on this 1-vCPU torch — a killed session resumes
        # instead of restarting (two multi-hour runs were lost to host
        # reboots before the ours-side banking landed)
        partial_path = os.path.abspath(
            os.path.join(workdir, f"ref_{algo}.partial.json"))
        fp = config_fingerprint(args, "reference")
        oa_a, oa_b, secs = resume_partial(partial_path, fp,
                                          f"ref {algo}")
        for s in range(len(oa_a), args.seeds):
            records.clear()
            mod.seed_torch(args.seed0 + s)
            t0 = time.time()
            mod.main(reference_args(
                args, dataID=GEOMETRIES[args.geometry]["ref_id"]))
            secs.append(time.time() - t0)
            oa_a.append(float(records[0][0]) * 100)
            if len(records) > 1:  # CCT evaluates a single network
                oa_b.append(float(records[1][0]) * 100)
            print(f"[ref {algo}] seed {args.seed0 + s}: "
                  f"OA={oa_a[-1]:.2f}"
                  + (f" OA1={oa_b[-1]:.2f}" if oa_b else "")
                  + f" ({secs[-1]:.0f}s)", file=sys.stderr)
            bank_partial(partial_path, fp, oa_a, oa_b, secs)
        return {"oa_a": oa_a, "oa_b": oa_b, "sec_per_seed": secs}
    finally:
        os.chdir(cwd)


def run_ours(algo: str, args, workdir: str, splits_dir: str,
             scene_npz: str) -> dict:
    """Run cmlpl_tpu's CLI main N times on the identical scene+splits.

    ``--ours_flags`` appends extra flags to our side only (e.g.
    ``--ours_flags --compute_dtype bfloat16 --rng_impl rbg``) so the
    perf knobs' OA impact can be measured against the same recorded
    reference distribution (the bf16/rbg study queued in
    docs/BENCHMARKS.md)."""
    from cmlpl_tpu.cli import train as cli_train
    from cmlpl_tpu.cli import train_cct as cli_cct
    from cmlpl_tpu.cli import train_cps as cli_cps

    ours_dir = os.path.join(workdir, "ours")
    os.makedirs(ours_dir, exist_ok=True)
    # Per-seed banking: multi-hour 1-vCPU runs have been killed twice by
    # host reboots; bank each finished seed so a crash resumes, not
    # restarts (mirrors hw_session.py's incremental session JSON).
    partial_path = os.path.abspath(
        os.path.join(workdir, f"ours_{algo}.partial.json"))
    cwd = os.getcwd()
    os.chdir(ours_dir)
    try:
        fp = config_fingerprint(args, "ours")
        oa_a, oa_b, secs = resume_partial(partial_path, fp,
                                          f"ours {algo}")
        for s in range(len(oa_a), args.seeds):
            flags = [
                "--dataID", GEOMETRIES[args.geometry]["ours_id"],
                "--n_PC", "60", "--w", "20",
                "--scene_npz", scene_npz,
                "--splits_dir", splits_dir,
                "--num_label", str(args.num_label),
                "--num_epochs", str(args.num_epochs),
                "--labeled_batch_size", str(args.labeled_batch_size),
                "--unlabeled_batch_size", str(args.unlabeled_batch_size),
                "--num_unlabel", str(args.num_unlabel),
                "--val_batch_size", str(args.val_batch_size),
                "--dropout", str(args.dropout), "--lr", str(args.lr),
                "--print_per_batches", "0",
                "--seed", str(args.seed0 + s)] + list(args.ours_flags)
            t0 = time.time()
            if algo == "cmlpl":
                acc_a, acc_b = cli_train.main(flags)
            elif algo == "cps":
                acc_a, acc_b = cli_cps.main(flags)
            else:
                acc_a, acc_b = cli_cct.main(flags), None
            secs.append(time.time() - t0)
            oa_a.append(acc_a.oa * 100)
            if acc_b is not None:
                oa_b.append(acc_b.oa * 100)
            print(f"[ours {algo}] seed {args.seed0 + s}: "
                  f"OA={oa_a[-1]:.2f}"
                  + (f" OA1={oa_b[-1]:.2f}" if oa_b else "")
                  + f" ({secs[-1]:.0f}s)", file=sys.stderr)
            bank_partial(partial_path, fp, oa_a, oa_b, secs)
        return {"oa_a": oa_a, "oa_b": oa_b, "sec_per_seed": secs}
    finally:
        os.chdir(cwd)


def materialize(args, workdir: str):
    """Generate the A/B scene (hard recipe: both implementations land
    mid-range OA where algorithmic differences show — the default
    synthetic scene saturates both sides at 100.00) and write it in the
    reference's .npy layout; returns (dataset dir, scene npz path)."""
    from cmlpl_tpu.cli.sample_generation import main as sample_main
    from cmlpl_tpu.data import synthetic_scene
    from cmlpl_tpu.registry import get_dataset

    geom = GEOMETRIES[args.geometry]
    cube, gt = synthetic_scene(geom["syn_spec"], rows=args.rows,
                               cols=args.cols, noise_std=args.noise_std,
                               class_sep=args.class_sep)
    scene_npz = os.path.join(workdir, "scene.npz")
    np.savez(scene_npz, cube=cube, gt=gt)

    data_root = os.path.join(workdir, "dataset")
    sample_main(["--dataID", geom["ours_id"],
                 "--num_label", str(args.num_label),
                 "--w", "20", "--n_PC", "60", "--data_root", data_root,
                 "--scene_npz", scene_npz, "--materialize_patches"])
    # the reference hard-codes ./dataset/<dirname>/ per dataID
    # (train.py:75-90); point it at the materialised set
    written = os.path.join(data_root, get_dataset(geom["ours_id"]).name)
    target = os.path.join(data_root, geom["dirname"])
    if not os.path.exists(target):
        os.symlink(written, target)
    return target, scene_npz


def verdict(ref: dict, ours: dict) -> dict:
    """Mean-overlap check: |mean diff| within two sigmas of the
    difference of means (floored at 1.0 OA point — n is small and the
    5-shot task is high-variance by construction, SURVEY §7)."""
    r = np.array(ref["oa_a"] + ref["oa_b"])
    o = np.array(ours["oa_a"] + ours["oa_b"])
    if min(len(r), len(o)) < 2:
        # var(ddof=1) on a 1-element side is NaN, which would serialize
        # as a misleading always-fail {"overlapping": false} plus
        # non-RFC NaN literals (advisor finding, r4)
        return {"ref_n": int(len(r)), "ours_n": int(len(o)),
                "overlapping": None,
                "error": "need >=2 OA values per side for a verdict"}
    se = float(np.sqrt(r.var(ddof=1) / len(r) + o.var(ddof=1) / len(o)))
    diff = float(o.mean() - r.mean())
    band = max(2.0 * se, 1.0)
    return {
        "ref_mean_oa": round(float(r.mean()), 2),
        "ref_std_oa": round(float(r.std()), 2),
        "ours_mean_oa": round(float(o.mean()), 2),
        "ours_std_oa": round(float(o.std()), 2),
        "mean_diff": round(diff, 2),
        "band": round(band, 2),
        "overlapping": bool(abs(diff) <= band),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algos", nargs="+", default=["cmlpl", "cps", "cct"],
                   choices=["cmlpl", "cps", "cct"])
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--seed0", type=int, default=1088)
    p.add_argument("--workdir", default="./refab")
    p.add_argument("--num_label", type=int, default=5)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--labeled_batch_size", type=int, default=64)
    p.add_argument("--unlabeled_batch_size", type=int, default=64)
    p.add_argument("--num_unlabel", type=int, default=2048)
    p.add_argument("--val_batch_size", type=int, default=512)
    p.add_argument("--dropout", type=float, default=0.8)
    p.add_argument("--lr", type=float, default=5e-4)
    # hard-scene recipe (same knobs as scripts/compare_methods.py): the
    # default synthetic scene saturates both sides at OA 100.00
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--cols", type=int, default=48)
    p.add_argument("--noise_std", type=float, default=1.2)
    p.add_argument("--class_sep", type=float, default=0.35)
    p.add_argument("--geometry", default="paviau",
                   choices=sorted(GEOMETRIES),
                   help="scene class-count/band-count geometry: paviau "
                        "= 9 classes x 103 bands (reference dataID 1), "
                        "salinas = 16 x 204 (dataID 2); the spatial "
                        "size stays --rows x --cols")
    p.add_argument("--skip_ref", action="store_true")
    p.add_argument("--skip_ours", action="store_true")
    p.add_argument("--ref_json", type=str, default=None,
                   help="with --skip_ref: reuse the reference OA "
                        "distributions recorded in a previous run's "
                        "JSON (e.g. docs/reference_ab_r3.json) so the "
                        "verdict still computes — the slow CPU torch "
                        "side runs once per scene/schedule, not once "
                        "per knob configuration")
    p.add_argument("--ours_flags", nargs=argparse.REMAINDER, default=[],
                   help="extra flags appended to OUR side's CLI only "
                        "(must be last; e.g. --ours_flags "
                        "--compute_dtype bfloat16 --rng_impl rbg)")
    p.add_argument("--out", type=str, default="reference_ab.json",
                   help="output JSON filename inside --workdir")
    p.add_argument("--ours_tpu", action="store_true",
                   help="run our side on the default accelerator (TPU) "
                        "instead of forcing host CPU.  OA comparisons "
                        "are hardware-independent; the CPU stays free "
                        "for the torch reference side (this host has "
                        "one vCPU).  Without it both sides share the "
                        "CPU and per-seed wall times are comparable.")
    args = p.parse_args(argv)

    if not args.ours_tpu:
        # same-host default: both sides on this host's CPU (must happen
        # before any backend init; the image's sitecustomize otherwise
        # registers the tunneled TPU backend)
        jax.config.update("jax_platforms", "cpu")

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    splits_dir, scene_npz = materialize(args, workdir)

    recorded_ref = {}
    if args.ref_json:
        with open(args.ref_json) as f:
            prior = json.load(f)
        recorded_ref = {a: e["reference"] for a, e in prior.items()
                        if isinstance(e, dict) and "reference" in e}

    results = {}
    for algo in args.algos:
        entry = {"algo": algo, "seeds": args.seeds,
                 "schedule": {
                     "num_epochs": args.num_epochs,
                     "batch": [args.labeled_batch_size,
                               args.unlabeled_batch_size],
                     "num_unlabel": args.num_unlabel,
                     "num_label": args.num_label},
                 "scene": {"rows": args.rows, "cols": args.cols,
                           "noise_std": args.noise_std,
                           "class_sep": args.class_sep,
                           "geometry": args.geometry}}
        if args.ours_flags:
            entry["ours_flags"] = list(args.ours_flags)
        if not args.skip_ref:
            entry["reference"] = run_reference(algo, args, workdir)
        elif algo in recorded_ref:
            entry["reference"] = dict(recorded_ref[algo],
                                      recorded_from=args.ref_json)
        if not args.skip_ours:
            entry["ours"] = run_ours(algo, args, workdir, splits_dir,
                                     scene_npz)
        if "reference" in entry and "ours" in entry:
            entry["verdict"] = verdict(entry["reference"], entry["ours"])
        results[algo] = entry
        print(json.dumps(entry))

    out = os.path.join(workdir, args.out)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}", file=sys.stderr)
    return results


if __name__ == "__main__":
    main()
