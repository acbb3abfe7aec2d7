"""Export a trained checkpoint as a standalone StableHLO artifact.

    python -m cmlpl_tpu.cli.export_model --dataID 1 \
        --checkpoint_dir ./ckpt --out paviau.cmlpl.zip [--eval_gather dense]

The artifact (see utils/export.py) embeds the trained weights and the
whole-scene predictor for the dataset's geometry; any JAX runtime for
the same platform can then classify scenes with

    from cmlpl_tpu.utils.export import load_exported   # or 10 lines of
    meta, fn = load_exported("paviau.cmlpl.zip")       # zipfile+jax.export
    preds = fn(padded_cube, spectra)

without the model code or checkpoint format.  ``--verify`` reloads the
artifact and checks it against the in-process predictor on the scene.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from cmlpl_tpu.cli._common import base_parser, build_config, build_data
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train import CMLPLTrainer
from cmlpl_tpu.utils.checkpoint import restore_checkpoint
from cmlpl_tpu.utils.export import (
    build_exported,
    load_exported,
    save_exported,
    save_native_bundle,
)


def _export_train_bundle(args):
    """--train_bundle: serialize the whole training schedule for the
    native host (utils/export.build_run_exported).  The seed, schedule,
    and init state replay cli.train's serial path exactly, so the
    host-produced final params match a Python run bit-for-bit (A/B'd on
    hardware by scripts/native_train_ab.py)."""
    from cmlpl_tpu.cli._common import setup_runtime
    from cmlpl_tpu.core.rng import seed_everything
    from cmlpl_tpu.utils.export import build_run_exported, save_run_bundle

    setup_runtime(args)
    spec = get_dataset(args.dataID)
    _, scene, _, sampler = build_data(args)
    trainer = CMLPLTrainer(build_config(args, spec))
    rng = seed_everything(args.seed, impl=args.rng_impl)
    meta, exported, inputs = build_run_exported(
        trainer, scene, sampler, jax.random.fold_in(rng, 0),
        platforms=args.platform)
    meta.update({"dataset": spec.name, "dataID": spec.data_id,
                 "seed": args.seed})
    save_run_bundle(args.train_bundle, meta, exported, inputs)
    n_bytes = sum(v.nbytes for v in inputs.values())
    print(f"train bundle -> {args.train_bundle}: "
          f"{len(exported.mlir_module_serialized) / 1e6:.2f} MB "
          f"StableHLO, {len(inputs)} inputs ({n_bytes / 1e6:.1f} MB), "
          f"{len(meta['output_names'])} outputs, "
          f"platforms={meta['platforms']}")
    return args.train_bundle


def _import_run(args):
    """--import_run: native host training outputs -> orbax checkpoint
    (utils/export.load_run_outputs).  The config flags must match the
    --train_bundle export so the state template's tree/shapes line up
    (mismatches are rejected leaf-by-leaf)."""
    from cmlpl_tpu.utils.checkpoint import save_checkpoint
    from cmlpl_tpu.utils.export import load_run_outputs

    if not args.checkpoint_dir:
        raise SystemExit("--import_run needs --checkpoint_dir")
    bundle, outdir = args.import_run
    spec = get_dataset(args.dataID)
    trainer = CMLPLTrainer(build_config(args, spec))
    template = jax.device_get(trainer.init_state(jax.random.key(0)))
    state, metrics = load_run_outputs(bundle, outdir, template)
    save_checkpoint(args.checkpoint_dir, state)
    tail = {k: float(np.asarray(v).reshape(-1)[-1])
            for k, v in metrics.items()}
    print(f"imported native run -> {args.checkpoint_dir} "
          f"(step {int(np.asarray(state.step))}); final metrics: "
          + " ".join(f"{k}={v:.4f}" for k, v in sorted(tail.items())))
    return args.checkpoint_dir


def main(argv=None):
    p = base_parser()
    p.add_argument("--out", type=str, default="model.cmlpl.zip")
    p.add_argument("--net", type=str, default="b", choices=["b", "e"])
    p.add_argument("--platform", nargs="*", default=None,
                   help="lowering platform(s), e.g. tpu cpu "
                        "(default: the current backend)")
    p.add_argument("--verify", action="store_true",
                   help="reload the artifact and compare predictions "
                        "against the in-process predictor")
    p.add_argument("--native_dir", type=str, default=None,
                   help="also write a raw PJRT host bundle "
                        "(module.stablehlo + compile_options.pb + "
                        "signature.txt) for native/pjrt_host.cc; needs a "
                        "single --platform")
    p.add_argument("--train_bundle", type=str, default=None,
                   help="instead of exporting a trained predictor, "
                        "export the ENTIRE fused CMLPL training run as a "
                        "native bundle into this dir (module.stablehlo + "
                        "signature + inputs/*.npy: init state, scene, "
                        "pre-drawn schedule) — the C++ host then trains "
                        "with no Python in the loop: pjrt_host --bundle "
                        "DIR --inputs DIR/inputs --outdir OUT")
    p.add_argument("--import_run", nargs=2, default=None,
                   metavar=("BUNDLE", "OUTDIR"),
                   help="import a native host training run (pjrt_host "
                        "--inputs BUNDLE/inputs --outdir OUTDIR on a "
                        "--train_bundle export) back into an orbax "
                        "checkpoint at --checkpoint_dir, so natively "
                        "trained params feed predict/serve; pass the "
                        "same config flags used at export")
    args = p.parse_args(argv)
    if args.import_run:
        return _import_run(args)
    if args.train_bundle:
        return _export_train_bundle(args)
    if not args.checkpoint_dir:
        raise SystemExit("--checkpoint_dir is required")
    if args.eval_gather == "auto":
        args.eval_gather = "xla"  # serializable patch-exact default
    if args.eval_gather not in ("xla", "dense"):
        raise SystemExit("--eval_gather must be xla or dense for export "
                         "(the Pallas modes embed a Mosaic custom-call)")

    spec = get_dataset(args.dataID)
    scene = build_data(args)[1]
    trainer = CMLPLTrainer(build_config(args, spec))
    template = jax.device_get(trainer.init_state(jax.random.key(0)))
    state = restore_checkpoint(args.checkpoint_dir, template)
    params = (state.net_b if args.net == "b" else state.net_e).params
    model = trainer.model

    def apply_fn(pr, xp, x):
        return model.apply({"params": pr}, xp, x, train=False)[0]

    meta, exported = build_exported(
        apply_fn, params, scene, gather=args.eval_gather,
        tile=args.val_batch_size, platforms=args.platform,
        extra_meta={"dataset": spec.name, "dataID": spec.data_id,
                    "net": args.net})
    payload = exported.serialize()
    save_exported(args.out, meta, payload)
    print(f"exported {args.out}: {len(payload) / 1e6:.2f} MB, "
          f"platforms={meta['platforms']}, gather={meta['gather']}")
    if args.native_dir:
        save_native_bundle(args.native_dir, meta, exported)
        print(f"native bundle -> {args.native_dir} "
              f"(module.stablehlo "
              f"{len(exported.mlir_module_serialized) / 1e6:.2f} MB)")

    if args.verify:
        meta2, fn = load_exported(args.out)
        t0 = time.time()
        preds = fn(scene.padded_pca, scene.spectra)
        print(f"artifact inference time == {time.time() - t0:.3f}s")
        from cmlpl_tpu.eval import ScenePredictor

        ref = ScenePredictor(apply_fn, patch_size=scene.patch_size,
                             cols=scene.cols, tile=args.val_batch_size,
                             gather=args.eval_gather)(params, scene)
        agree = float(np.mean(preds == ref))
        print(f"agreement vs in-process predictor: {agree:.5f}")
        if agree < 1.0:
            raise SystemExit("verification FAILED")
    return args.out


if __name__ == "__main__":
    main()
