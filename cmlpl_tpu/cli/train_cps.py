"""CPS training CLI (reference ``trian_CPS.py``)."""

from __future__ import annotations

import os
import time

from cmlpl_tpu.cli._common import (
    base_parser,
    setup_runtime,
    build_config,
    build_data,
    make_epoch_hook,
    save_history,
    maybe_resume,
    report_accuracy,
    save_final_checkpoint,
    save_path,
)
from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.core.rng import seed_everything
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy, save_report
from cmlpl_tpu.eval.visualize import save_class_map
from cmlpl_tpu.train import CPSTrainer


def main(argv=None):
    args = base_parser().parse_args(argv)
    setup_runtime(args)
    spec, scene, splits, sampler = build_data(args)
    cfg = build_config(args, spec)
    mesh = create_mesh()

    rng = seed_everything(args.seed, impl=args.rng_impl)
    trainer = CPSTrainer(cfg, mesh=mesh)
    state = trainer.init_state(rng)
    state, start_epoch = maybe_resume(args, state,
                                      sampler.batches_per_epoch,
                                      trainer=trainer)
    state, history = trainer.fit(state, scene, sampler,
                                 log_every=args.print_per_batches,
                                 start_epoch=start_epoch,
                                 on_epoch_end=make_epoch_hook(args))
    save_history(args, history)

    model = trainer.model

    def apply_b(params, xp, x):
        return model.apply({"params": params}, xp, x, train=False)[0]

    predictor = ScenePredictor(apply_b, patch_size=cfg.patch_size,
                               cols=scene.cols, tile=cfg.val_batch,
                               mesh=mesh, gather=args.eval_gather)
    t0 = time.time()
    pred_b = predictor(state.net_b.params, scene)
    print(f"full-scene inference time == {time.time() - t0:.3f}s")
    pred_e = predictor(state.net_e.params, scene)

    y_test = scene.labels[splits.test] - 1
    acc_b = cal_accuracy(pred_b[splits.test], y_test)
    acc_e = cal_accuracy(pred_e[splits.test], y_test)
    report_accuracy("net B", acc_b)
    report_accuracy("net E", acc_e)

    from cmlpl_tpu.cli._common import is_primary

    out = save_path(args, spec)
    if is_primary():
        save_class_map(
            os.path.join(out, f"CPS_OA_{int(acc_b.oa * 10000)}.svg"),
            pred_b + 1, spec, rows=scene.rows, cols=scene.cols)
        save_report(os.path.join(out, "cps_results.csv"), [acc_b], [acc_e])
    save_final_checkpoint(args, state)
    return acc_b, acc_e


if __name__ == "__main__":
    from cmlpl_tpu.cli._common import run_resilient

    run_resilient(main)

