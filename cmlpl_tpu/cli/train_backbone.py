"""Supervised backbone training CLI — covers the comparison-model zoo
(reference ``tools/conpared_models.py``; the reference ships no training
script for these).

Example:
    python -m cmlpl_tpu.cli.train_backbone --dataID 1 --model ssftt \
        --w 13 --n_PC 5 --num_epochs 100
"""

from __future__ import annotations

import os
import time

from cmlpl_tpu.cli._common import (
    base_parser,
    setup_runtime,
    make_epoch_hook,
    save_history,
    maybe_resume,
    report_accuracy,
    save_final_checkpoint,
    save_path,
)
from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.core.rng import seed_everything
from cmlpl_tpu.data import generate_splits, prepare_scene
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy, save_report
from cmlpl_tpu.eval.visualize import save_class_map
from cmlpl_tpu.models.zoo import ZOO, build_model
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train.supervised import SupervisedTrainer


def main(argv=None):
    p = base_parser()
    p.add_argument("--model", type=str, default="ssftt",
                   choices=sorted(ZOO.keys()))
    p.add_argument("--epoch_samples", type=int, default=None,
                   help="tile the labeled split to this many samples/epoch")
    p.add_argument("--ema_teacher", type=float, default=0.0,
                   help="EMA-teacher decay alpha (e.g. 0.95): maintain an "
                        "exponential-moving-average copy of the weights "
                        "and ALSO evaluate it (reference WeightEMA_BN, "
                        "tools/models.py:155-164 — dead code there)")
    args = p.parse_args(argv)
    setup_runtime(args)

    spec = get_dataset(args.dataID)
    entry = ZOO[args.model]
    w = args.w if args.w != 20 or entry.default_patch == 20 \
        else entry.default_patch
    n_pc = args.n_PC if args.n_PC != 60 or entry.default_n_pc == 60 \
        else entry.default_n_pc
    if n_pc == -1:
        n_pc = spec.num_bands

    scene = prepare_scene(spec, root=args.data_root, patch_size=w,
                          n_pc=n_pc)
    splits = generate_splits(scene.labels, num_label=args.num_label)
    mesh = create_mesh()
    rng = seed_everything(args.seed)

    model, entry = build_model(args.model, spec, n_pc)
    trainer = SupervisedTrainer(
        model, entry, lr=args.lr, patch_size=w, n_pc=n_pc,
        num_features=spec.num_bands, mesh=mesh,
        augment=bool(args.augment), gather_impl=args.gather_impl,
        ema_alpha=args.ema_teacher)
    state = trainer.init_state(rng)
    bs = min(args.labeled_batch_size, len(splits.train))
    state, start_epoch = maybe_resume(
        args, state,
        trainer.steps_per_epoch(len(splits.train), bs, args.epoch_samples),
        trainer=trainer)
    state, history = trainer.fit(
        state, scene, splits.train, scene.labels, batch_size=bs,
        num_epochs=args.num_epochs, epoch_samples=args.epoch_samples,
        log_every=args.print_per_batches, start_epoch=start_epoch,
        on_epoch_end=make_epoch_hook(args))
    save_history(args, history)

    predictor = ScenePredictor(trainer.logits_fn(), patch_size=w,
                               cols=scene.cols, tile=args.val_batch_size,
                               mesh=mesh, gather=args.eval_gather)
    t0 = time.time()
    pred = predictor(trainer.eval_variables(state), scene)
    print(f"full-scene inference time == {time.time() - t0:.3f}s")

    y_test = scene.labels[splits.test] - 1
    acc = cal_accuracy(pred[splits.test], y_test)
    report_accuracy(args.model, acc)
    if args.ema_teacher > 0:
        pred_t = predictor(trainer.eval_variables(state, ema=True), scene)
        acc_t = cal_accuracy(pred_t[splits.test], y_test)
        report_accuracy(f"{args.model} EMA teacher", acc_t)

    out = save_path(args, spec)
    save_class_map(
        os.path.join(out, f"{args.model}_OA_{int(acc.oa * 10000)}.svg"),
        pred + 1, spec, rows=scene.rows, cols=scene.cols)
    save_report(os.path.join(out, f"{args.model}_results.csv"), [acc])
    save_final_checkpoint(args, state)
    return acc


if __name__ == "__main__":
    from cmlpl_tpu.cli._common import run_resilient

    run_resilient(main)

