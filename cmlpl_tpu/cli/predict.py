"""Serving CLI: classify a whole scene from a trained checkpoint.

The reference has no standalone inference path (test_whole only runs at
the end of training); this closes the deploy loop:

    python -m cmlpl_tpu.cli.predict --dataID 1 \
        --checkpoint_dir ./ckpt --out map.svg
"""

from __future__ import annotations

import time

import jax

from cmlpl_tpu.cli._common import base_parser, report_accuracy
from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.data import generate_splits, prepare_scene
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy
from cmlpl_tpu.eval.visualize import save_class_map
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train import CMLPLTrainer
from cmlpl_tpu.utils.checkpoint import restore_checkpoint


def main(argv=None):
    p = base_parser()
    p.add_argument("--out", type=str, default="classification_map.svg")
    p.add_argument("--net", type=str, default="b", choices=["b", "e"],
                   help="which of the two mutually-trained networks")
    args = p.parse_args(argv)
    if not args.checkpoint_dir:
        raise SystemExit("--checkpoint_dir is required")

    spec = get_dataset(args.dataID)
    scene = prepare_scene(spec, root=args.data_root, patch_size=args.w,
                          n_pc=args.n_PC)
    mesh = create_mesh()

    from cmlpl_tpu.cli._common import build_config

    trainer = CMLPLTrainer(build_config(args, spec), mesh=mesh)
    template = jax.device_get(trainer.init_state(jax.random.key(0)))
    state = restore_checkpoint(args.checkpoint_dir, template)
    params = (state.net_b if args.net == "b" else state.net_e).params
    model = trainer.model

    predictor = ScenePredictor(
        lambda pr, xp, x: model.apply({"params": pr}, xp, x,
                                      train=False)[0],
        patch_size=args.w, cols=scene.cols, tile=args.val_batch_size,
        mesh=mesh, gather=args.eval_gather)
    t0 = time.time()
    pred = predictor(params, scene)
    print(f"classified {scene.num_pixels} pixels in "
          f"{time.time() - t0:.3f}s")

    save_class_map(args.out, pred + 1, spec, rows=scene.rows,
                   cols=scene.cols)
    print(f"wrote {args.out}")

    # if ground truth exists, also report test-split accuracy
    if scene.labels.max() > 0:
        splits = generate_splits(scene.labels, num_label=args.num_label)
        acc = cal_accuracy(pred[splits.test],
                           scene.labels[splits.test] - 1)
        report_accuracy(f"net {args.net.upper()}", acc)
    return pred


if __name__ == "__main__":
    main()
