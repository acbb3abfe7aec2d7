"""CCT training CLI (reference ``trian_CCT.py``)."""

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
from cmlpl_tpu.train import CCTTrainer


def main(argv=None):
    args = base_parser().parse_args(argv)
    setup_runtime(args)
    spec, scene, splits, sampler = build_data(args)
    cfg = build_config(args, spec)
    mesh = create_mesh()

    rng = seed_everything(args.seed, impl=args.rng_impl)
    trainer = CCTTrainer(cfg, mesh=mesh)
    state = trainer.init_state(rng)
    state, start_epoch = maybe_resume(args, state,
                                      sampler.batches_per_epoch,
                                      trainer=trainer)
    state, history = trainer.fit(state, scene, sampler,
                                 log_every=args.print_per_batches,
                                 start_epoch=start_epoch,
                                 on_epoch_end=make_epoch_hook(args))
    save_history(args, history)

    encoder, head = trainer.encoder, trainer.head

    # CCT inference: encoder feature -> base decoder head
    # (reference CCT_test_whole, hyper_tools.py:462-484)
    def apply_cct(params, xp, x):
        fea, _ = encoder.apply({"params": params["encoder"]}, xp, x,
                               train=False)
        return head.apply({"params": params["dec_base"]}, fea)

    predictor = ScenePredictor(apply_cct, patch_size=cfg.patch_size,
                               cols=scene.cols, tile=cfg.val_batch,
                               mesh=mesh, gather=args.eval_gather)
    t0 = time.time()
    pred = predictor(state.params, scene)
    print(f"full-scene inference time == {time.time() - t0:.3f}s")

    y_test = scene.labels[splits.test] - 1
    acc = cal_accuracy(pred[splits.test], y_test)
    report_accuracy("CCT", acc)

    from cmlpl_tpu.cli._common import is_primary

    out = save_path(args, spec)
    if is_primary():
        save_class_map(
            os.path.join(out, f"CCT_OA_{int(acc.oa * 10000)}.svg"),
            pred + 1, spec, rows=scene.rows, cols=scene.cols)
        save_report(os.path.join(out, "cct_results.csv"), [acc])
    save_final_checkpoint(args, state)
    return acc


if __name__ == "__main__":
    from cmlpl_tpu.cli._common import run_resilient

    run_resilient(main)

