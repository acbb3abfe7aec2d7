"""End-to-end train-step tests on a tiny synthetic cube (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from cmlpl_tpu.data import SemiSupervisedSampler
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer, CPSTrainer, CCTTrainer


def _tiny_cfg(scene, **kw):
    defaults = dict(num_classes=9, num_features=103, n_pc=scene.n_pc,
                    patch_size=scene.patch_size, labeled_batch=8,
                    unlabeled_batch=8, num_unlabel=32, num_epochs=2,
                    queue_batch=1)
    defaults.update(kw)
    return CMLPLConfig(**defaults)


def _sampler(splits, scene, cfg):
    return SemiSupervisedSampler(splits, scene.labels, cfg.labeled_batch,
                                 cfg.unlabeled_batch,
                                 num_unlabel=cfg.num_unlabel)


def _leaf_delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_cmlpl_step_updates_both_nets_and_queues(tiny_scene, tiny_splits):
    cfg = _tiny_cfg(tiny_scene)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    sampler = _sampler(tiny_splits, tiny_scene, cfg)
    li, ly, ui = next(iter(sampler.epoch()))

    new_state, metrics = trainer.train_step(
        state, tiny_scene, li, ly, ui, epoch=0, batch_index=0)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert _leaf_delta(new_state.net_b.params, state.net_b.params) > 0
    assert _leaf_delta(new_state.net_e.params, state.net_e.params) > 0
    # queue pointer advanced by bt + btu = 16
    assert int(new_state.queue_w.ptr) == 16
    assert int(new_state.queue_s.ptr) == 16
    assert int(new_state.step) == 1


def test_cmlpl_warm_path_uses_smoothing(tiny_scene, tiny_splits):
    # thr=0 makes the confidence mask all-ones, so con_loss is sensitive
    # to the smoothed-vs-raw pseudo-labels
    cfg = _tiny_cfg(tiny_scene, thr=0.0)
    trainer = CMLPLTrainer(cfg, donate=False)
    sampler = _sampler(tiny_splits, tiny_scene, cfg)
    li, ly, ui = next(iter(sampler.epoch()))

    # same rng-state start, warm vs cold must diverge once queues are
    # non-zero: run one cold step to fill queues, then compare
    state = trainer.init_state(jax.random.key(0))
    state, _ = trainer.train_step(state, tiny_scene, li, ly, ui, 0, 0)
    _, m_cold = trainer.train_step(state, tiny_scene, li, ly, ui,
                                   epoch=0, batch_index=0)   # warm False
    _, m_warm = trainer.train_step(state, tiny_scene, li, ly, ui,
                                   epoch=1, batch_index=0)   # warm True
    assert float(m_cold["con_loss"]) != float(m_warm["con_loss"])


def test_cmlpl_fit_runs_and_loss_decreases(tiny_scene, tiny_splits):
    cfg = _tiny_cfg(tiny_scene, num_epochs=3, dropout=0.2, noise=0.1)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    sampler = _sampler(tiny_splits, tiny_scene, cfg)
    state, history = trainer.fit(state, tiny_scene, sampler, log_every=0)
    first = float(history[0]["cls_loss"])
    last = float(history[-1]["cls_loss"])
    assert last < first  # 45-shot supervised CE should drop fast


def test_cps_step(tiny_scene, tiny_splits):
    cfg = _tiny_cfg(tiny_scene)
    trainer = CPSTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    sampler = _sampler(tiny_splits, tiny_scene, cfg)
    li, ly, ui = next(iter(sampler.epoch()))
    new_state, metrics = trainer.train_step(state, tiny_scene, li, ly, ui)
    assert np.isfinite(float(metrics["total_loss"]))
    assert _leaf_delta(new_state.net_b.params, state.net_b.params) > 0


def test_cct_step(tiny_scene, tiny_splits):
    cfg = _tiny_cfg(tiny_scene)
    trainer = CCTTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    sampler = _sampler(tiny_splits, tiny_scene, cfg)
    li, ly, ui = next(iter(sampler.epoch()))
    new_state, metrics = trainer.train_step(state, tiny_scene, li, ly, ui)
    assert np.isfinite(float(metrics["total_loss"]))
    assert _leaf_delta(new_state.params["encoder"],
                       state.params["encoder"]) > 0
    assert _leaf_delta(new_state.params["dec1"], state.params["dec1"]) > 0


def test_stack_nets_bitwise_identical(tiny_scene, tiny_splits):
    """CMLPLConfig.stack_nets (one vmapped forward over a net axis) must
    be numerically identical to the two-call path: same params, same
    inputs, same per-net dropout keys.  (Perf knob only; the TPU A/B
    recorded it 7.5% slower — docs/BENCHMARKS.md — but the equality
    pin keeps the knob honest.)"""
    cfg = _tiny_cfg(tiny_scene)
    sampler = _sampler(tiny_splits, tiny_scene, cfg)
    li, ly, ui = next(iter(sampler.epoch()))
    out = {}
    for s in [False, True]:
        import dataclasses

        t = CMLPLTrainer(dataclasses.replace(cfg, stack_nets=s),
                         donate=False)
        st = t.init_state(jax.random.key(0))
        _, m = t.train_step(st, tiny_scene, li, ly, ui, 0, 0)
        out[s] = {k: float(v) for k, v in m.items()}
    for k in out[False]:
        np.testing.assert_allclose(out[True][k], out[False][k],
                                   rtol=1e-6, atol=1e-7, err_msg=k)
