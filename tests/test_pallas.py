"""Pallas patch-gather kernel vs the XLA gather (interpret mode on CPU;
the same kernel is validated on real TPU by bench/verify runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cmlpl_tpu.data.patches import gather_patches, pad_symmetric
from cmlpl_tpu.ops.patch_gather import (
    gather_patches_pallas,
    lane_pad_cube,
)


@pytest.mark.parametrize("w", [20, 8])
def test_pallas_gather_matches_xla(rng, w):
    X = rng.normal(size=(30, 22, 8)).astype(np.float32)
    padded = jnp.asarray(pad_symmetric(X, w // 2))
    idx = jnp.asarray(rng.integers(0, 30 * 22, size=64).astype(np.int32))
    want = np.asarray(gather_patches(padded, idx, cols=22, w=w))
    got = np.asarray(gather_patches_pallas(padded, idx, cols=22, w=w,
                                           interpret=True))
    np.testing.assert_allclose(got, want)


def test_pallas_gather_ragged_batch(rng):
    # batch not a multiple of BLOCK exercises the pad-and-slice path
    X = rng.normal(size=(16, 16, 4)).astype(np.float32)
    padded = jnp.asarray(pad_symmetric(X, 4))
    idx = jnp.asarray(rng.integers(0, 256, size=21).astype(np.int32))
    want = np.asarray(gather_patches(padded, idx, cols=16, w=8))
    got = np.asarray(gather_patches_pallas(padded, idx, cols=16, w=8,
                                           interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want)


def test_lane_pad_cube():
    x = jnp.ones((4, 4, 60))
    padded = lane_pad_cube(x)
    assert padded.shape == (4, 4, 128)
    np.testing.assert_allclose(np.asarray(padded[..., :60]), 1.0)
    np.testing.assert_allclose(np.asarray(padded[..., 60:]), 0.0)
    y = jnp.ones((4, 4, 128))
    assert lane_pad_cube(y) is y


def test_make_train_gather_variants(rng):
    """The gather knob's three impls agree (bf16 up to input quantisation)."""
    from cmlpl_tpu.ops.patch_gather import make_train_gather

    X = rng.normal(size=(30, 22, 8)).astype(np.float32)
    padded = jnp.asarray(pad_symmetric(X, 10))
    idx = jnp.asarray(rng.integers(0, 30 * 22, size=32).astype(np.int32))

    prep_x, gather_x = make_train_gather("xla", 8)
    want = np.asarray(gather_x(prep_x(padded), idx, 22, 20))

    prep_p, gather_p = make_train_gather("pallas", 8)
    got_p = np.asarray(gather_p(prep_p(padded), idx, 22, 20))
    assert got_p.dtype == np.float32 and got_p.shape == want.shape
    np.testing.assert_allclose(got_p, want)

    prep_b, gather_b = make_train_gather("pallas_bf16", 8)
    prepped = prep_b(padded)
    # the 8-column-shift cube: (8, rows, cols + 7, 128) bf16
    assert prepped.dtype == jnp.bfloat16
    assert prepped.shape == (8, padded.shape[0], padded.shape[1] + 7, 128)
    got_b = np.asarray(gather_b(prepped, idx, 22, 20))
    assert got_b.dtype == np.float32
    # exact vs the bf16-quantised oracle
    oracle = np.asarray(gather_x(
        prep_x(padded.astype(jnp.bfloat16).astype(jnp.float32)),
        idx, 22, 20))
    np.testing.assert_allclose(got_b, oracle)


def test_shifted_gather_odd_w_and_ragged(rng):
    """The 8-shift kernel for odd w (span rounds to 16) + ragged batch."""
    from cmlpl_tpu.ops.patch_gather import (build_shifted_cube_bf16,
                                            gather_patches_pallas_shifted)

    X = rng.normal(size=(16, 16, 4)).astype(np.float32)
    padded = jnp.asarray(pad_symmetric(X, 4))  # w=9 odd: hw=4, +1 col
    padded = jnp.pad(padded, ((0, 1), (0, 1), (0, 0)))
    idx = jnp.asarray(rng.integers(0, 256, size=21).astype(np.int32))
    want = np.asarray(gather_patches(
        padded.astype(jnp.bfloat16).astype(jnp.float32), idx,
        cols=16, w=9))
    cube8 = build_shifted_cube_bf16(padded)
    got = np.asarray(gather_patches_pallas_shifted(
        cube8, idx, cols=16, w=9, interpret=True)[..., :4],
        dtype=np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want)


def test_check_gather_mesh_guard():
    import jax
    from jax.sharding import Mesh

    from cmlpl_tpu.ops.patch_gather import check_gather_mesh

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    check_gather_mesh("xla", mesh)          # always fine
    check_gather_mesh("pallas_bf16", None)  # no mesh: fine
    with pytest.raises(ValueError, match="single-device mesh"):
        check_gather_mesh("pallas_bf16", mesh)


def test_cmlpl_step_with_pallas_bf16_gather(tiny_scene, tiny_splits):
    """A fused CMLPL step with gather_impl=pallas_bf16 (interpret mode on
    CPU) stays close to the default-xla step: same rng stream, only the
    patch INPUT precision differs."""
    import jax

    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

    scene = tiny_scene
    kw = dict(num_classes=9, num_features=103, n_pc=scene.n_pc,
              patch_size=scene.patch_size, labeled_batch=8,
              unlabeled_batch=8, num_unlabel=32, num_epochs=2,
              noise=0.0, dropout=0.0, thr=0.0)
    li = tiny_splits.train[:8].astype(np.int32)
    ly = (scene.labels[li] - 1).astype(np.int32)
    ui = tiny_splits.unlabeled[:8].astype(np.int32)

    losses = {}
    for impl in ["xla", "pallas_bf16"]:
        trainer = CMLPLTrainer(CMLPLConfig(gather_impl=impl, **kw),
                               donate=False)
        state = trainer.init_state(jax.random.key(0))
        state, m = trainer.train_step(state, scene, li, ly, ui,
                                      epoch=0, batch_index=0)
        losses[impl] = float(m["total_loss"])
    assert np.isfinite(losses["pallas_bf16"])
    np.testing.assert_allclose(losses["pallas_bf16"], losses["xla"],
                               rtol=2e-2)


def test_cps_cct_step_with_pallas_bf16_gather(tiny_scene, tiny_splits):
    """The gather knob is honored by the CPS/CCT fused steps too."""
    import jax

    from cmlpl_tpu.train import CMLPLConfig, CPSTrainer, CCTTrainer

    scene = tiny_scene
    kw = dict(num_classes=9, num_features=103, n_pc=scene.n_pc,
              patch_size=scene.patch_size, labeled_batch=8,
              unlabeled_batch=8, num_unlabel=32, num_epochs=1,
              noise=0.0, dropout=0.0)
    li = tiny_splits.train[:8].astype(np.int32)
    ly = (scene.labels[li] - 1).astype(np.int32)
    ui = tiny_splits.unlabeled[:8].astype(np.int32)

    for cls in [CPSTrainer, CCTTrainer]:
        losses = {}
        for impl in ["xla", "pallas_bf16", "pool"]:
            t = cls(CMLPLConfig(gather_impl=impl, **kw), donate=False)
            s = t.init_state(jax.random.key(0))
            _, m = t.train_step(s, scene, li, ly, ui)
            losses[impl] = float(m["total_loss"])
        assert np.isfinite(losses["pallas_bf16"]), cls.__name__
        np.testing.assert_allclose(losses["pallas_bf16"], losses["xla"],
                                   rtol=2e-2, err_msg=cls.__name__)
        # pool re-reads the same patch values -> numerically identical
        np.testing.assert_allclose(losses["pool"], losses["xla"],
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=cls.__name__)


def test_cmlpl_pool_gather_matches_xla(tiny_scene, tiny_splits):
    """gather_impl='pool' (pre-gathered training pool, VERDICT r2 #2) is
    numerically identical to the default per-step xla gather: same patch
    values reach the same math, for both a single step and the fused
    whole run."""
    import jax

    from cmlpl_tpu.data import SemiSupervisedSampler
    from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer

    scene = tiny_scene
    kw = dict(num_classes=9, num_features=103, n_pc=scene.n_pc,
              patch_size=scene.patch_size, labeled_batch=8,
              unlabeled_batch=8, num_unlabel=32, num_epochs=2)
    li = tiny_splits.train[:8].astype(np.int32)
    ly = (scene.labels[li] - 1).astype(np.int32)
    ui = tiny_splits.unlabeled[:8].astype(np.int32)

    step_m, run_m = {}, {}
    for impl in ["xla", "pool"]:
        trainer = CMLPLTrainer(CMLPLConfig(gather_impl=impl, **kw),
                               donate=False)
        state = trainer.init_state(jax.random.key(0))
        _, m = trainer.train_step(state, scene, li, ly, ui,
                                  epoch=0, batch_index=0)
        step_m[impl] = {k: float(v) for k, v in m.items()}
        sampler = SemiSupervisedSampler(
            tiny_splits, scene.labels, 8, 8, num_unlabel=32)
        state = trainer.init_state(jax.random.key(0))
        _, mm = trainer.train_run(state, scene, sampler)
        run_m[impl] = {k: np.asarray(v) for k, v in mm.items()}

    for k in step_m["xla"]:
        np.testing.assert_allclose(step_m["pool"][k], step_m["xla"][k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for k in run_m["xla"]:
        np.testing.assert_allclose(run_m["pool"][k], run_m["xla"][k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_shifted_gather_fuzz_geometries(rng):
    """Randomised scene/patch geometries vs the quantised oracle."""
    from cmlpl_tpu.ops.patch_gather import (build_shifted_cube_bf16,
                                            gather_patches_pallas_shifted)

    for _ in range(6):
        rows = int(rng.integers(8, 40))
        cols = int(rng.integers(8, 40))
        ch = int(rng.integers(1, 9))
        w = int(rng.integers(3, 13))
        b = int(rng.integers(1, 40))
        X = rng.normal(size=(rows, cols, ch)).astype(np.float32)
        padded = jnp.asarray(pad_symmetric(X, w // 2))
        if w % 2 == 1:  # odd w: reference pads hw rows/cols each side,
            padded = jnp.pad(padded, ((0, 1), (0, 1), (0, 0)))
        idx = jnp.asarray(rng.integers(0, rows * cols, size=b)
                          .astype(np.int32))
        want = np.asarray(gather_patches(
            padded.astype(jnp.bfloat16).astype(jnp.float32), idx,
            cols=cols, w=w))
        got = np.asarray(gather_patches_pallas_shifted(
            build_shifted_cube_bf16(padded), idx, cols=cols, w=w,
            interpret=True)[..., :ch], dtype=np.float32)
        np.testing.assert_allclose(got, want,
                                   err_msg=f"{rows}x{cols}x{ch} w={w} b={b}")


def test_scene_predictor_bf16_gather_on_mesh(tiny_scene):
    """Multi-chip (shard_map) inference with the bf16 shift-cube gather:
    the 4-D cube must pass through the replicated in_spec and each chip's
    local pallas_call must agree with the single-device path."""
    import jax
    from jax.sharding import Mesh

    from cmlpl_tpu.eval import ScenePredictor
    from cmlpl_tpu.models import BaseNet2

    model = BaseNet2(num_features=103, num_classes=9, n_pc=tiny_scene.n_pc)
    xp0 = jnp.zeros((1, 20, 20, tiny_scene.n_pc))
    x0 = jnp.zeros((1, 103))
    params = model.init(jax.random.key(2), xp0, x0, train=False)["params"]

    def apply(p, xp, x):
        return model.apply({"params": p}, xp, x, train=False)[0]

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    single = ScenePredictor(apply, patch_size=20, cols=tiny_scene.cols,
                            tile=128, gather="pallas_bf16")(params,
                                                            tiny_scene)
    sharded = ScenePredictor(apply, patch_size=20, cols=tiny_scene.cols,
                             tile=128, mesh=mesh,
                             gather="pallas_bf16")(params, tiny_scene)
    np.testing.assert_array_equal(single, sharded)
