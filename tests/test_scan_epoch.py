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
