"""Method comparison on a hard synthetic PaviaU-shaped scene:
supervised-only vs CMLPL vs CPS vs CCT, 5 labels/class.

This is the rebuild's analogue of the reference paper's comparison table
(real cubes aren't vendored; the synthetic scene's difficulty is tuned so
5-shot supervised training does NOT saturate, leaving room for the
semi-supervised objectives to show their value).

Run on the TPU: ``python scripts/compare_methods.py``  (~10 min, mostly
compiles).  Results land in docs/BENCHMARKS.md territory — see the repo's
commit that ran it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import numpy as np

from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.data import (
    SemiSupervisedSampler,
    generate_splits,
    prepare_scene,
    synthetic_scene,
)
from cmlpl_tpu.eval import ScenePredictor, cal_accuracy
from cmlpl_tpu.registry import get_dataset
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer, CPSTrainer, CCTTrainer
from cmlpl_tpu.train.supervised import SupervisedTrainer
from cmlpl_tpu.models.zoo import build_model

NUM_LABEL = 5
SEEDS = [0, 1, 2]


def build_scene():
    spec = get_dataset(1)
    cube, gt = synthetic_scene(spec, rows=200, cols=150, noise_std=1.2,
                               class_sep=0.35)
    scene = prepare_scene(spec, cube=cube, gt=gt, patch_size=20, n_pc=60)
    splits = generate_splits(scene.labels, num_label=NUM_LABEL)
    return spec, scene, splits


def evaluate(apply_fn, params, scene, splits, mesh):
    predictor = ScenePredictor(apply_fn, patch_size=20, cols=scene.cols,
                               tile=2048, mesh=mesh)
    pred = predictor(params, scene)
    return cal_accuracy(pred[splits.test], scene.labels[splits.test] - 1)


def run_semi(trainer_cls, cfg, scene, splits, mesh, seed):
    sampler = SemiSupervisedSampler(splits, scene.labels, cfg.labeled_batch,
                                    cfg.unlabeled_batch,
                                    num_unlabel=cfg.num_unlabel, seed=seed)
    trainer = trainer_cls(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.key(seed, impl="rbg"))
    state, _ = trainer.fit(state, scene, sampler, log_every=0)
    return trainer, state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--extras", action="store_true",
                    help="also run the opt-in objective variants "
                         "(cmlpl + memobank / mmd / ntxent / augment)")
    ap.add_argument("--seeds", type=int, default=len(SEEDS))
    args = ap.parse_args(argv)
    spec, scene, splits = build_scene()
    mesh = create_mesh()
    cfg = CMLPLConfig(num_classes=spec.num_classes,
                      num_features=spec.num_bands,
                      num_unlabel=min(10000, len(splits.unlabeled)))
    results: dict[str, list[float]] = {}

    def eval_cmlpl_variant(name, variant_cfg, seed):
        trainer, state = run_semi(CMLPLTrainer, variant_cfg, scene, splits,
                                  mesh, seed)
        m = trainer.model
        acc = evaluate(lambda p, xp, x: m.apply({"params": p}, xp, x,
                                                train=False)[0],
                       state.net_b.params, scene, splits, mesh)
        results.setdefault(name, []).append(acc.oa)

    for seed in SEEDS[:args.seeds]:
        # supervised-only BaseNet2 (same epochs-equivalent step count)
        model, entry = build_model("basenet2", spec, 60)
        sup = SupervisedTrainer(model, entry, patch_size=20, n_pc=60,
                                num_features=spec.num_bands, mesh=mesh)
        st = sup.init_state(jax.random.key(seed, impl="rbg"))
        st, _ = sup.fit(st, scene, splits.train, scene.labels,
                        batch_size=45, num_epochs=cfg.num_epochs,
                        epoch_samples=cfg.num_unlabel, log_every=0)
        acc = evaluate(sup.logits_fn(), sup.eval_variables(st), scene,
                       splits, mesh)
        results.setdefault("supervised", []).append(acc.oa)

        trainer, state = run_semi(CMLPLTrainer, cfg, scene, splits, mesh,
                                  seed)
        m = trainer.model
        acc = evaluate(lambda p, xp, x: m.apply({"params": p}, xp, x,
                                                train=False)[0],
                       state.net_b.params, scene, splits, mesh)
        results.setdefault("cmlpl", []).append(acc.oa)

        trainer, state = run_semi(CPSTrainer, cfg, scene, splits, mesh,
                                  seed)
        m = trainer.model
        acc = evaluate(lambda p, xp, x: m.apply({"params": p}, xp, x,
                                                train=False)[0],
                       state.net_b.params, scene, splits, mesh)
        results.setdefault("cps", []).append(acc.oa)

        trainer, state = run_semi(CCTTrainer, cfg, scene, splits, mesh,
                                  seed)
        enc, head = trainer.encoder, trainer.head
        acc = evaluate(
            lambda p, xp, x: head.apply(
                {"params": p["dec_base"]},
                enc.apply({"params": p["encoder"]}, xp, x,
                          train=False)[0]),
            state.params, scene, splits, mesh)
        results.setdefault("cct", []).append(acc.oa)

        if args.extras:
            import dataclasses
            for extra in ["memobank", "mmd", "ntxent"]:
                eval_cmlpl_variant(
                    f"cmlpl+{extra}",
                    dataclasses.replace(cfg, extra_loss=extra,
                                        extra_weight=0.1), seed)
            eval_cmlpl_variant(
                "cmlpl+augment",
                dataclasses.replace(cfg, augment=("flip", "rot90",
                                                  "radiation")), seed)
            # EMA-teacher efficacy (--ema_teacher, reference WeightEMA_BN
            # tools/models.py:155-164): same supervised run, teacher eval
            model, entry = build_model("basenet2", spec, 60)
            emat = SupervisedTrainer(model, entry, patch_size=20, n_pc=60,
                                     num_features=spec.num_bands,
                                     ema_alpha=0.95, mesh=mesh)
            st = emat.init_state(jax.random.key(seed, impl="rbg"))
            st, _ = emat.fit(st, scene, splits.train, scene.labels,
                             batch_size=45, num_epochs=cfg.num_epochs,
                             epoch_samples=cfg.num_unlabel, log_every=0)
            acc = evaluate(emat.logits_fn(),
                           emat.eval_variables(st, ema=True), scene,
                           splits, mesh)
            results.setdefault("supervised+ema", []).append(acc.oa)
        print(f"seed {seed} done", file=sys.stderr)

    print(f"{'method':12s} {'OA mean':>8s} {'std':>6s}  ({len(SEEDS)} seeds,"
          f" {NUM_LABEL} labels/class, hard synthetic 200x150 scene)")
    for name, oas in results.items():
        print(f"{name:12s} {np.mean(oas) * 100:8.2f} "
              f"{np.std(oas) * 100:6.2f}")


if __name__ == "__main__":
    main()
