"""CMLPL training CLI (reference ``train.py``): semi-supervised dual-network
training, full-scene inference, OA/AA/Kappa report, class map, CSV."""

from __future__ import annotations

import os
import time

from cmlpl_tpu.cli._common import (
    base_parser,
    setup_runtime,
    build_config,
    build_data,
    is_primary,
    make_epoch_hook,
    maybe_resume,
    report_accuracy,
    save_final_checkpoint,
    save_path,
)
from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.core.rng import seed_everything
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy, save_report
from cmlpl_tpu.eval.visualize import save_class_map
from cmlpl_tpu.train import CMLPLTrainer


def main(argv=None):
    args = base_parser().parse_args(argv)
    setup_runtime(args)
    spec, scene, splits, sampler = build_data(args)
    cfg = build_config(args, spec)
    mesh = create_mesh()

    rng = seed_everything(args.seed, impl=args.rng_impl)
    trainer = CMLPLTrainer(cfg, mesh=mesh)
    model = trainer.model

    def apply_b(params, xp, x):
        return model.apply({"params": params}, xp, x, train=False)[0]

    # ScenePredictor handles pod meshes itself (tiles split across
    # hosts, strips allgathered back — eval/inference.py)
    predictor = ScenePredictor(apply_b, patch_size=cfg.patch_size,
                               cols=scene.cols, tile=cfg.val_batch,
                               mesh=mesh, gather=args.eval_gather)
    y_test = scene.labels[splits.test] - 1
    out = save_path(args, spec)

    runs_b, runs_e = [], []
    state = None
    import jax

    if args.fused_iters and args.num_iters > 1:
        # all --num_iters runs as ONE vmapped dispatch, seeds sharded
        # over the mesh data axis; identical results to the serial loop
        # below (pinned by tests/test_multi_run.py)
        if args.resume or args.profile_dir or args.checkpoint_every:
            raise SystemExit("--fused_iters is incompatible with "
                             "--resume/--profile_dir/--checkpoint_every")
        import numpy as np

        t0 = time.time()
        ms, metrics = trainer.train_multi_run(rng, scene, sampler,
                                              args.num_iters)
        jax.block_until_ready(ms)
        print(f"fused {args.num_iters}-seed training time == "
              f"{time.time() - t0:.3f}s")
        from cmlpl_tpu.cli._common import save_history

        m0 = jax.device_get(jax.tree_util.tree_map(lambda a: a[0], metrics))
        save_history(args, [
            {k: v.reshape(-1)[j] for k, v in m0.items()}
            for j in range(next(iter(m0.values())).size)])

        for i in range(args.num_iters):
            params_b = jax.tree_util.tree_map(lambda a: a[i],
                                              ms.net_b.params)
            params_e = jax.tree_util.tree_map(lambda a: a[i],
                                              ms.net_e.params)
            pred_b = predictor(params_b, scene)
            pred_e = predictor(params_e, scene)
            acc_b = cal_accuracy(pred_b[splits.test], y_test)
            acc_e = cal_accuracy(pred_e[splits.test], y_test)
            report_accuracy("net B", acc_b)
            report_accuracy("net E", acc_e)
            runs_b.append(acc_b)
            runs_e.append(acc_e)
            if is_primary():
                save_class_map(
                    os.path.join(out,
                                 f"CMLPL_OA_{int(acc_b.oa * 10000)}.svg"),
                    pred_b + 1, spec, rows=scene.rows, cols=scene.cols)
        state = jax.tree_util.tree_map(lambda a: a[-1], ms)
        if is_primary():
            save_report(os.path.join(out, "cmlpl_results.csv"),
                        runs_b, runs_e)
        oas = np.array([r.oa for r in runs_b])
        print(f"mean_OA ± std_OA is: {oas.mean()} ± {oas.std()}")
        save_final_checkpoint(args, state)
        return runs_b[-1], runs_e[-1]

    for index_iter in range(args.num_iters):
        state = trainer.init_state(jax.random.fold_in(rng, index_iter))
        start_epoch = 0
        if index_iter == 0:
            state, start_epoch = maybe_resume(args, state,
                                              sampler.batches_per_epoch,
                                              trainer=trainer)

        if args.profile_dir and index_iter == 0:
            from cmlpl_tpu.utils.profiling import trace

            with trace(args.profile_dir):
                state, _ = trainer.fit(
                    state, scene, sampler, log_every=0,
                    start_epoch=start_epoch,
                    on_epoch_end=make_epoch_hook(args))
                start_epoch = cfg.num_epochs  # whole run traced
        state, history = trainer.fit(state, scene, sampler,
                                     log_every=args.print_per_batches,
                                     start_epoch=start_epoch,
                                     on_epoch_end=make_epoch_hook(args))
        if index_iter == 0:
            from cmlpl_tpu.cli._common import save_history

            save_history(args, history)

        t0 = time.time()
        pred_b = predictor(state.net_b.params, scene)
        print(f"full-scene inference time == {time.time() - t0:.3f}s")
        pred_e = predictor(state.net_e.params, scene)

        acc_b = cal_accuracy(pred_b[splits.test], y_test)
        acc_e = cal_accuracy(pred_e[splits.test], y_test)
        report_accuracy("net B", acc_b)
        report_accuracy("net E", acc_e)
        runs_b.append(acc_b)
        runs_e.append(acc_e)

        if is_primary():
            save_class_map(
                os.path.join(out, f"CMLPL_OA_{int(acc_b.oa * 10000)}.svg"),
                pred_b + 1, spec, rows=scene.rows, cols=scene.cols)

    if is_primary():
        save_report(os.path.join(out, "cmlpl_results.csv"), runs_b, runs_e)
    if args.num_iters > 1:
        import numpy as np

        oas = np.array([r.oa for r in runs_b])
        print(f"mean_OA ± std_OA is: {oas.mean()} ± {oas.std()}")

    save_final_checkpoint(args, state)
    return runs_b[-1], runs_e[-1]


if __name__ == "__main__":
    from cmlpl_tpu.cli._common import run_resilient

    run_resilient(main)

