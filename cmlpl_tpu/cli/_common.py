"""Shared CLI plumbing: argparse defaults mirroring the reference
(``train.py:355-380``) and scene/split construction."""

from __future__ import annotations

import argparse
import os

import numpy as np

from cmlpl_tpu.data import (
    SemiSupervisedSampler,
    generate_splits,
    prepare_scene,
)
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train.state import CMLPLConfig


def base_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--dataID", type=str, default="1")
    p.add_argument("--num_label", type=int, default=5)
    p.add_argument("--save_path_prefix", type=str, default="./")
    p.add_argument("--data_root", type=str, default="./dataset")
    p.add_argument("--metrics_csv", type=str, default=None,
                   help="write the per-step training metrics history "
                        "(losses, accuracy, mask rate) to this CSV")
    p.add_argument("--scene_npz", type=str, default=None,
                   help="load the raw scene from this .npz "
                        "(arrays 'cube' (rows, cols, bands) and 'gt' "
                        "(rows, cols)) instead of the registry .mat "
                        "files — bring-your-own-cube ingestion; dataID "
                        "still supplies class count/bands/palette")
    p.add_argument("--splits_dir", type=str, default=None,
                   help="directory holding the reference's materialised "
                        "train_array.npy / test_array.npy / "
                        "unlabel_array.npy (e.g. a reference "
                        "dataset/<name>/ dir); default: regenerate the "
                        "byte-identical splits from --num_label")
    # train (reference train.py:361-368)
    p.add_argument("--labeled_batch_size", type=int, default=128)
    p.add_argument("--unlabeled_batch_size", type=int, default=128)
    p.add_argument("--val_batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--print_per_batches", type=int, default=10)
    p.add_argument("--num_unlabel", type=int, default=10000)
    p.add_argument("--thr", type=float, default=1.0)
    p.add_argument("--alpha", type=float, default=0.95)
    p.add_argument("--queue-batch", dest="queue_batch", type=float,
                   default=17)
    p.add_argument("--temperature", type=float, default=0.3)
    # network (train.py:376-379)
    p.add_argument("--dropout", type=float, default=0.8)
    p.add_argument("--noise", type=float, default=0.5)
    p.add_argument("--w", type=int, default=20)
    p.add_argument("--n_PC", type=int, default=60)
    p.add_argument("--seed", type=int, default=1088)
    p.add_argument("--rng_impl", type=str, default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="PRNG impl; rbg is ~30%% faster on TPU, "
                        "identical noise distribution")
    p.add_argument("--noise_impl", type=str, default="normal",
                   choices=["normal", "binom16"],
                   help="input-view noise sampler: binom16 = "
                        "standardised Binomial(16,1/2) via "
                        "population_count (no erfinv; mean 0 / var 1 "
                        "lattice within +/-4 sigma)")
    p.add_argument("--noise_fused", action="store_true",
                   help="draw each net's labeled||unlabeled noise view "
                        "with one key over the concatenated tensor (4 "
                        "RNG kernels instead of 8; same distribution "
                        "and independence, different stream)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (params stay float32)")
    p.add_argument("--input_dtype", type=str, default="compute",
                   choices=["compute", "float32"],
                   help="dtype of gathered patches/noise views at the "
                        "dispatch boundary; 'compute' stores them in the "
                        "compute dtype (halves their HBM traffic under "
                        "bfloat16), 'float32' keeps the pre-r3c f32 "
                        "inputs")
    p.add_argument("--eval_gather", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "pallas_bf16",
                            "dense"],
                   help="full-scene inference patch gather: auto = "
                        "Pallas f32 DMA on TPU / XLA elsewhere; "
                        "pallas_bf16 = DMA from a bf16 shift-cube "
                        "(measured 1.48x faster scene maps; patch inputs "
                        "bf16-quantised); dense = NO gather, one dilated "
                        "whole-scene conv pass (BaseNet2/CCT; "
                        "GSPMD-sharded over the mesh incl. pods; "
                        "boundary semantics differ slightly from patch "
                        "eval — 99.6% prediction agreement measured)")
    p.add_argument("--gather_impl", type=str, default="auto",
                   choices=["auto", "xla", "pallas", "pallas_bf16",
                            "pool"],
                   help="training patch-gather: auto (default) = 'pool' "
                        "when the trainer supports it and the pool fits "
                        "the HBM budget, else 'xla' — both reference "
                        "numerics; 'pool' (CMLPL/CPS/CCT) pre-gathers "
                        "the ~10k-pixel training pool once per dispatch "
                        "into ~1 GB HBM so per-step gathers become row "
                        "takes (+22.6% measured, numerically identical "
                        "to xla); 'xla' = per-step dynamic-slice, zero "
                        "extra HBM; 'pallas'/'pallas_bf16' = DMA-kernel "
                        "gathers (single-chip A/B knobs)")
    p.add_argument("--extra_loss", type=str, default="",
                   choices=["", "memobank", "mmd", "ntxent"],
                   help="opt-in extra objective (CMLPL trainer): U2PL "
                        "memory-bank InfoNCE, labeled/unlabeled MMD, or "
                        "cross-net NT-Xent")
    p.add_argument("--extra_weight", type=float, default=0.1,
                   help="weight of --extra_loss in the total loss")
    p.add_argument("--augment", nargs="*", default=[],
                   choices=["flip", "rot90", "radiation", "mixture"],
                   help="opt-in patch augmentations "
                        "(hsi_loader.py:58-107, dead in the reference)")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="save a checkpoint every N epochs (0 = only at "
                        "the end, with --checkpoint_dir)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in "
                        "--checkpoint_dir")
    p.add_argument("--max_restarts", type=int, default=0,
                   help="elastic recovery: on an unhandled training "
                        "failure, retry the run up to N times, resuming "
                        "from the latest checkpoint in --checkpoint_dir "
                        "(requires --checkpoint_dir; pair with "
                        "--checkpoint_every for mid-run restart points). "
                        "The reference has no failure handling — any "
                        "exception kills the run (SURVEY §5)")
    # fault injection for the elastic-recovery tests: raise RuntimeError
    # in the epoch hook right after epoch N's checkpoint is written
    p.add_argument("--fail_at_epoch", type=int, default=0,
                   help=argparse.SUPPRESS)
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed for a multi-host pod "
                        "before mesh creation (auto-discovers coordinator "
                        "on TPU pods; no-op for a single process)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of one epoch into "
                        "this directory")
    p.add_argument("--num_iters", type=int, default=1,
                   help="repeat training num_iters times and report "
                        "mean±std (reference train.py:116 index_iter loop)")
    p.add_argument("--fused_iters", action="store_true",
                   help="run all --num_iters training runs as ONE vmapped "
                        "dispatch with the seed axis sharded over the mesh "
                        "data axis (identical results to the serial loop; "
                        "incompatible with --resume/--profile_dir/"
                        "--checkpoint_every)")
    return p


def build_config(args, spec) -> CMLPLConfig:
    return CMLPLConfig(
        num_classes=spec.num_classes,
        num_features=spec.num_bands,
        num_label=args.num_label,
        n_pc=args.n_PC,
        patch_size=args.w,
        labeled_batch=args.labeled_batch_size,
        unlabeled_batch=args.unlabeled_batch_size,
        val_batch=args.val_batch_size,
        lr=args.lr,
        num_epochs=args.num_epochs,
        num_unlabel=args.num_unlabel,
        thr=args.thr,
        alpha=args.alpha,
        queue_batch=int(args.queue_batch),
        temperature=args.temperature,
        dropout=args.dropout,
        noise=args.noise,
        seed=args.seed,
        compute_dtype=args.compute_dtype,
        input_dtype=args.input_dtype,
        rng_impl=args.rng_impl,
        noise_impl=args.noise_impl,
        noise_fused=args.noise_fused,
        gather_impl=args.gather_impl,
        extra_loss=args.extra_loss,
        extra_weight=args.extra_weight,
        augment=tuple(args.augment),
    )


def setup_runtime(args) -> None:
    """Process-level runtime init; must run before any mesh/backend use.
    With --multihost, joins the pod via jax.distributed.initialize
    (guarded single-process no-op, core/mesh.initialize_multihost)."""
    if getattr(args, "multihost", False):
        from cmlpl_tpu.core.mesh import initialize_multihost

        n = initialize_multihost()
        import jax

        print(f"multihost: {n} process(es), "
              f"{jax.device_count()} global device(s)")


def build_data(args):
    spec = get_dataset(args.dataID)
    cube = gt = None
    if getattr(args, "scene_npz", None):
        with np.load(args.scene_npz) as z:
            cube, gt = z["cube"], z["gt"]
    scene = prepare_scene(spec, root=args.data_root, patch_size=args.w,
                          n_pc=args.n_PC, cube=cube, gt=gt)
    if getattr(args, "splits_dir", None):
        from cmlpl_tpu.data import load_splits

        splits = load_splits(args.splits_dir)
    else:
        splits = generate_splits(scene.labels, num_label=args.num_label)
    sampler = SemiSupervisedSampler(
        splits, scene.labels, args.labeled_batch_size,
        args.unlabeled_batch_size, num_unlabel=args.num_unlabel,
        seed=args.seed)
    return spec, scene, splits, sampler


def make_epoch_hook(args):
    """Periodic-checkpoint hook for fit(on_epoch_end=...), or None when
    neither --checkpoint_dir/--checkpoint_every nor the fault-injection
    knob is set.

    --fail_at_epoch N (test-only) raises AFTER epoch N's checkpoint is
    written, so a supervised retry (run_resilient) resumes at epoch N and
    the injection point is never revisited — deterministic one-shot
    failure."""
    ckpt = bool(args.checkpoint_dir and args.checkpoint_every)
    fail_at = getattr(args, "fail_at_epoch", 0)
    if not ckpt and not fail_at:
        return None

    def hook(epoch, st):
        if ckpt and (epoch + 1) % args.checkpoint_every == 0:
            from cmlpl_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.checkpoint_dir, st)
        if fail_at and (epoch + 1) == fail_at:
            raise RuntimeError(
                f"fault injection: failing after epoch {epoch + 1}")

    return hook


def run_resilient(entry, argv=None):
    """Elastic-recovery supervisor: run ``entry(argv)``; on an unhandled
    exception, retry up to ``--max_restarts`` times with ``--resume``
    appended so the retry continues from the latest checkpoint instead of
    restarting from scratch.

    The reference has no failure handling at all — any exception kills
    the run and training restarts from zero (SURVEY §5 "failure
    detection: absent").  Here a transient failure (preemption-style
    device loss, injected fault, OOM on a shared host) costs at most
    ``--checkpoint_every`` epochs of progress.  Retries happen in the
    same process: ``initialize_multihost`` is idempotent and the trainers
    re-place restored state on their mesh (``maybe_resume``), so the
    same path works single-chip and on pods.  Requires
    ``--checkpoint_dir`` (no restart point -> a retry would just repeat
    the failure from scratch; we re-raise instead)."""
    import sys

    argv = list(sys.argv[1:]) if argv is None else list(argv)
    probe = argparse.ArgumentParser(add_help=False)
    probe.add_argument("--max_restarts", type=int, default=0)
    probe.add_argument("--checkpoint_dir", type=str, default=None)
    known, _ = probe.parse_known_args(argv)
    attempts = 0
    while True:
        try:
            return entry(argv)
        except (SystemExit, KeyboardInterrupt):
            raise
        except Exception as e:
            attempts += 1
            if attempts > known.max_restarts or not known.checkpoint_dir:
                raise
            print(f"training attempt failed ({type(e).__name__}: {e}); "
                  f"restart {attempts}/{known.max_restarts} from the "
                  f"latest checkpoint")
            if "--resume" not in argv:
                argv.append("--resume")


def maybe_resume(args, state, batches_per_epoch: int, trainer=None):
    """--resume: restore the latest checkpoint into ``state``'s structure
    and derive the epoch to restart from; returns (state, start_epoch).

    With ``trainer``, the restored host-local state is re-placed on the
    trainer's mesh with its state shardings (core.mesh.place_state) —
    required on multi-process pods, where the jitted fns' in_shardings
    span non-addressable devices and reject plain host arrays."""
    if not (args.resume and args.checkpoint_dir):
        return state, 0
    import jax

    from cmlpl_tpu.utils.checkpoint import restore_checkpoint

    try:
        state = restore_checkpoint(args.checkpoint_dir,
                                   jax.device_get(state))
        start_epoch = int(state.step) // batches_per_epoch
        if trainer is not None:
            from cmlpl_tpu.core.mesh import place_state

            state = place_state(trainer.mesh, state,
                                getattr(trainer, "_state_sh", None))
        print(f"resumed from step {int(jax.device_get(state.step))} "
              f"(epoch {start_epoch})")
        return state, start_epoch
    except FileNotFoundError:
        print("no checkpoint to resume from; starting fresh")
        return state, 0


def save_final_checkpoint(args, state) -> None:
    if args.checkpoint_dir:
        from cmlpl_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint_dir, state)


def save_path(args, spec) -> str:
    path = os.path.join(
        args.save_path_prefix, f"Experiment_{spec.data_id}",
        f"label_{args.num_label}")
    os.makedirs(path, exist_ok=True)
    return path


def report_accuracy(name: str, acc) -> None:
    print(f"Result ({name}):\n OA={acc.oa * 100:.2f}, "
          f"Kappa={acc.kappa * 100:.2f}")
    print("producerA:", np.array2string(acc.producer * 100, precision=2))
    print(f"AA={acc.aa * 100:.2f}")


def save_history(args, history) -> None:
    """--metrics_csv: persist fit()'s per-step metric dicts (the
    reference only prints running means, train.py:274-289)."""
    if not getattr(args, "metrics_csv", None) or not history:
        return
    if not is_primary():
        return  # pod runs: one writer
    import numpy as np
    import pandas as pd

    rows = [{k: float(np.asarray(v)) for k, v in m.items()}
            for m in history]
    pd.DataFrame(rows).to_csv(args.metrics_csv, index_label="step")
    print(f"wrote {args.metrics_csv} ({len(rows)} steps)")


def is_primary() -> bool:
    """True on the process that should write files/logs in a pod run
    (single-process: always)."""
    import jax

    return jax.process_index() == 0
