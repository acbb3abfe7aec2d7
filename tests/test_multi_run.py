"""Fused multi-seed runs (``EpochDriver.train_multi_run``).

The reference repeats its whole train/eval loop serially per iteration
(train.py:72 ``for index_iter in range(num_iters)``) to report mean±std
OA; the fused path vmaps the whole-run dispatch over a seed axis and
shards seeds over the mesh ``data`` axis.  These tests pin that the
fused path replays the serial CLI loop exactly (same ``fold_in`` init,
same sampler draw order) and that the seed axis actually lands on
distinct devices.  (Kept deliberately small: every fused variant is a
fresh whole-run compile on the 1-vCPU test host.)
"""

import jax
import numpy as np

from cmlpl_tpu.core.mesh import create_mesh
from cmlpl_tpu.data import SemiSupervisedSampler
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer, CPSTrainer


def _cfg(scene, **kw):
    return CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                       patch_size=scene.patch_size, labeled_batch=8,
                       unlabeled_batch=8, num_unlabel=48, num_epochs=2,
                       queue_batch=2, **kw)


def _sampler(scene, splits, cfg, seed=7):
    return SemiSupervisedSampler(splits, scene.labels, cfg.labeled_batch,
                                 cfg.unlabeled_batch,
                                 num_unlabel=cfg.num_unlabel, seed=seed)


def _serial(trainer, scene, sampler, rng, n):
    """Replay of the CLI's serial --num_iters loop (cli/train.py:54)."""
    finals, hists = [], []
    for i in range(n):
        st = trainer.init_state(jax.random.fold_in(rng, i))
        st, hist = trainer.fit(st, scene, sampler, log_every=0)
        finals.append(st)
        hists.append(hist)
    return finals, hists


def _assert_matches_serial(finals, hists, ms, metrics, params_of,
                           tag="", rtol=5e-3, atol=1e-5):
    n = len(finals)
    for i in range(n):
        for pa, pb in zip(jax.tree_util.tree_leaves(params_of(finals[i])),
                          jax.tree_util.tree_leaves(params_of(ms))):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb)[i],
                                       rtol=rtol, atol=atol,
                                       err_msg=f"{tag} params seed {i}")
        flat = {k: np.asarray(v[i]).reshape(-1) for k, v in metrics.items()}
        for j, h in enumerate(hists[i]):
            for k in h:
                np.testing.assert_allclose(float(h[k]), float(flat[k][j]),
                                           rtol=rtol, atol=atol,
                                           err_msg=f"{tag} {k}")


def test_cmlpl_multi_run_matches_serial_and_shards(tiny_scene, tiny_splits):
    """One test so the expensive whole-run compiles are shared: the fused
    2-seed run equals the serial loop, the same run on a 2-device mesh
    places one seed per device with equal results, and a non-divisible
    seed count falls back to a replicated seed axis."""
    cfg = _cfg(tiny_scene)
    trainer = CMLPLTrainer(cfg, donate=False)
    rng = jax.random.key(42)
    finals, hists = _serial(trainer, tiny_scene,
                            _sampler(tiny_scene, tiny_splits, cfg), rng, 2)
    ms, metrics = trainer.train_multi_run(
        rng, tiny_scene, _sampler(tiny_scene, tiny_splits, cfg), 2)
    _assert_matches_serial(finals, hists, ms, metrics,
                           lambda s: s.net_b.params, tag="single-device")

    # seed axis on a 2-device mesh: one seed per device via shard_map
    # (each device runs the UNPARTITIONED program on its seed block —
    # GSPMD in_shardings would miscompile the vmapped 1x1 conv on
    # XLA:CPU, see driver.py::_get_multi_fn), so results match the
    # serial loop at the usual tolerance.
    assert jax.device_count() >= 2, "conftest must force 8 CPU devices"
    mesh = create_mesh(jax.devices()[:2])
    t_mesh = CMLPLTrainer(cfg, mesh=mesh, donate=False)
    ms2, metrics2 = t_mesh.train_multi_run(
        rng, tiny_scene, _sampler(tiny_scene, tiny_splits, cfg), 2)
    leaf = jax.tree_util.tree_leaves(ms2.net_b.params)[0]
    assert leaf.sharding.spec[0] == "data"
    shard_devs = {s.device for s in leaf.addressable_shards}
    assert len(shard_devs) == 2
    assert all(s.data.shape[0] == 1 for s in leaf.addressable_shards)
    _assert_matches_serial(finals, hists, ms2, metrics2,
                           lambda s: s.net_b.params, tag="mesh")

    # non-divisible seed count: replicated fallback still runs and
    # matches the serial loop
    ms3, metrics3 = t_mesh.train_multi_run(
        rng, tiny_scene, _sampler(tiny_scene, tiny_splits, cfg), 3)
    leaf3 = jax.tree_util.tree_leaves(ms3.net_b.params)[0]
    assert leaf3.shape[0] == 3
    sp3 = leaf3.sharding.spec
    assert len(sp3) == 0 or sp3[0] != "data"  # replicated seed axis
    for i in range(2):
        for pa, pb in zip(
                jax.tree_util.tree_leaves(finals[i].net_b.params),
                jax.tree_util.tree_leaves(ms3.net_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb)[i],
                                       rtol=5e-3, atol=1e-5,
                                       err_msg=f"replicated seed {i}")


def test_cps_multi_run_matches_serial(tiny_scene, tiny_splits):
    cfg = _cfg(tiny_scene)
    trainer = CPSTrainer(cfg, donate=False)
    rng = jax.random.key(3)
    finals, hists = _serial(trainer, tiny_scene,
                            _sampler(tiny_scene, tiny_splits, cfg), rng, 2)
    ms, metrics = trainer.train_multi_run(
        rng, tiny_scene, _sampler(tiny_scene, tiny_splits, cfg), 2)
    _assert_matches_serial(finals, hists, ms, metrics,
                           lambda s: s.net_b.params)


def test_multi_run_xla_gather_impl(tiny_scene, tiny_splits):
    """The non-pool raw run entry vmaps too (explicit --gather_impl xla)."""
    cfg = _cfg(tiny_scene, gather_impl="xla")
    trainer = CMLPLTrainer(cfg, donate=False)
    rng = jax.random.key(9)
    finals, hists = _serial(trainer, tiny_scene,
                            _sampler(tiny_scene, tiny_splits, cfg), rng, 2)
    ms, metrics = trainer.train_multi_run(
        rng, tiny_scene, _sampler(tiny_scene, tiny_splits, cfg), 2)
    _assert_matches_serial(finals, hists, ms, metrics,
                           lambda s: s.net_b.params)
