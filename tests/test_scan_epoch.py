"""The fused scanned-epoch path must be numerically identical to the
per-step path (same rng threading, same warmup/threshold schedule)."""

import jax
import numpy as np

from cmlpl_tpu.data import SemiSupervisedSampler
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer


def test_scanned_epoch_matches_stepwise(tiny_scene, tiny_splits):
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=tiny_scene.n_pc,
                      patch_size=tiny_scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=48, num_epochs=2,
                      queue_batch=2)
    trainer = CMLPLTrainer(cfg, donate=False)

    def run(scan):
        sampler = SemiSupervisedSampler(
            tiny_splits, tiny_scene.labels, cfg.labeled_batch,
            cfg.unlabeled_batch, num_unlabel=cfg.num_unlabel, seed=7)
        state = trainer.init_state(jax.random.key(0))
        state, history = trainer.fit(state, tiny_scene, sampler,
                                     log_every=0, scan_epochs=scan)
        return state, history

    s_step, h_step = run(False)
    s_scan, h_scan = run(True)

    assert len(h_step) == len(h_scan)
    for a, b in zip(h_step, h_scan):
        for k in a:
            np.testing.assert_allclose(float(a[k]), float(b[k]),
                                       rtol=5e-3, atol=1e-5, err_msg=k)
    for pa, pb in zip(jax.tree_util.tree_leaves(s_step.net_b.params),
                      jax.tree_util.tree_leaves(s_scan.net_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=5e-3, atol=1e-5)
    assert int(s_scan.step) == int(s_step.step)


def test_supervised_scan_run_matches_stepwise(tiny_scene, tiny_splits):
    from cmlpl_tpu.models.zoo import build_model
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train.supervised import SupervisedTrainer

    spec = get_dataset(0)
    model, entry = build_model("basenet2", spec, tiny_scene.n_pc)

    def run(scan):
        trainer = SupervisedTrainer(
            model, entry, patch_size=tiny_scene.patch_size,
            n_pc=tiny_scene.n_pc, num_features=spec.num_bands,
            donate=False)
        state = trainer.init_state(jax.random.key(0))
        state, history = trainer.fit(
            state, tiny_scene, tiny_splits.train, tiny_scene.labels,
            batch_size=16, num_epochs=3, epoch_samples=32, seed=3,
            log_every=0, scan_run=scan)
        return state, history

    s_step, h_step = run(False)
    s_scan, h_scan = run(True)
    assert len(h_step) == len(h_scan)
    for a, b in zip(h_step, h_scan):
        np.testing.assert_allclose(float(a["cls_loss"]),
                                   float(b["cls_loss"]),
                                   rtol=5e-3, atol=1e-5)
    for pa, pb in zip(jax.tree_util.tree_leaves(s_step.params),
                      jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=5e-3, atol=1e-5)


def test_bf16_input_cast_scan_matches_stepwise(tiny_scene, tiny_splits):
    """input_dtype="compute" (r3c): the bf16 pool/view cast is applied at
    every jitted entry (step, epoch, run), so the scanned paths must stay
    numerically identical to the per-step path under the fast stack."""
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=tiny_scene.n_pc,
                      patch_size=tiny_scene.patch_size, labeled_batch=8,
                      unlabeled_batch=8, num_unlabel=48, num_epochs=2,
                      queue_batch=2, gather_impl="pool",
                      compute_dtype="bfloat16", input_dtype="compute")
    trainer = CMLPLTrainer(cfg, donate=False)

    def run(scan):
        sampler = SemiSupervisedSampler(
            tiny_splits, tiny_scene.labels, cfg.labeled_batch,
            cfg.unlabeled_batch, num_unlabel=cfg.num_unlabel, seed=7)
        state = trainer.init_state(jax.random.key(0))
        state, history = trainer.fit(state, tiny_scene, sampler,
                                     log_every=0, scan_epochs=scan)
        return state, history

    s_step, h_step = run(False)
    s_scan, h_scan = run(True)
    for a, b in zip(h_step, h_scan):
        for k in a:
            np.testing.assert_allclose(float(a[k]), float(b[k]),
                                       rtol=5e-3, atol=1e-4, err_msg=k)
    # XLA fuses the scan body differently from the standalone step, so
    # bf16 rounding can differ in the last bit and accumulate over the
    # 12 training steps — tolerance reflects bf16, not a different path
    # (observed worst-case drift 5.2e-4 on params of magnitude ~3e-3)
    for pa, pb in zip(jax.tree_util.tree_leaves(s_step.net_b.params),
                      jax.tree_util.tree_leaves(s_scan.net_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=5e-3, atol=1.5e-3)
