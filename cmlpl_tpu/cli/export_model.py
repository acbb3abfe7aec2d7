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
    args = p.parse_args(argv)
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
