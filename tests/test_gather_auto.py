"""The "auto" training-gather default (r3d).

"auto" must resolve to the pre-gathered-pool path exactly when the
trainer supports it and the pool fits the HBM budget — so reference
users on default flags get the +22.6% path (docs/BENCHMARKS.md
"pre-gathered-pool") without losing reference numerics — and fall back
to the per-step dynamic-slice gather everywhere else.
"""

import dataclasses

import numpy as np

from cmlpl_tpu.ops.patch_gather import (
    POOL_AUTO_BUDGET_BYTES,
    POOL_BUCKET,
    resolve_gather_impl,
)
from cmlpl_tpu.train.cct import CCTTrainer
from cmlpl_tpu.train.cmlpl import CMLPLTrainer
from cmlpl_tpu.train.cps import CPSTrainer
from cmlpl_tpu.train.state import CMLPLConfig

TINY = dict(num_classes=4, num_features=16, n_pc=6, patch_size=8,
            labeled_batch=8, unlabeled_batch=8, num_unlabel=32,
            num_epochs=1)


def test_resolution_rules():
    # reference schedule (PaviaU defaults): pool is ~0.97 GB -> pool
    assert resolve_gather_impl(
        "auto", num_unlabel=10000, patch_size=20, n_pc=60,
        num_labeled=45) == "pool"
    # a pool past the budget falls back to the per-step gather
    assert resolve_gather_impl(
        "auto", num_unlabel=300000, patch_size=20, n_pc=60) == "xla"
    # trainers without a pool path (SupervisedTrainer) get xla
    assert resolve_gather_impl(
        "auto", num_unlabel=10000, patch_size=20, n_pc=60,
        pool_supported=False) == "xla"
    # explicit impls pass through untouched
    for impl in ("xla", "pool", "pallas", "pallas_bf16"):
        assert resolve_gather_impl(
            impl, num_unlabel=10**9, patch_size=20, n_pc=60) == impl
    # the budget boundary is the documented formula: uniques rounded up
    # to the poolify bucket, f32 row bytes
    max_rows = POOL_AUTO_BUDGET_BYTES // (20 * 20 * 60 * 4)
    fit = (max_rows // POOL_BUCKET) * POOL_BUCKET  # largest bucketed fit
    assert resolve_gather_impl(
        "auto", num_unlabel=fit, patch_size=20, n_pc=60) == "pool"
    assert resolve_gather_impl(
        "auto", num_unlabel=fit + 1, patch_size=20, n_pc=60) == "xla"


def test_resolution_counts_labeled_uniques():
    """The labeled side must be derived from the schedule (VERDICT r3
    item 6): a many-class/many-shot split pushes the pool over budget
    even when num_unlabel alone would fit."""
    max_rows = POOL_AUTO_BUDGET_BYTES // (20 * 20 * 60 * 4)
    fit = (max_rows // POOL_BUCKET) * POOL_BUCKET
    assert resolve_gather_impl(
        "auto", num_unlabel=fit - 4096, patch_size=20, n_pc=60,
        num_labeled=0) == "pool"
    # num_label=500 x 16 classes = 8000 labeled uniques -> over budget
    assert resolve_gather_impl(
        "auto", num_unlabel=fit - 4096, patch_size=20, n_pc=60,
        num_labeled=8000) == "xla"
    # and the trainers pass num_label * num_classes through: same
    # schedule via a trainer config resolves to xla, not pool
    big = CMLPLConfig(num_classes=16, num_features=16, n_pc=60,
                      patch_size=20, labeled_batch=8, unlabeled_batch=8,
                      num_unlabel=fit - 4096, num_label=500, num_epochs=1)
    t = CMLPLTrainer(big, donate=False)
    assert t.config.gather_impl == "xla"
    small = dataclasses.replace(big, num_label=5)
    assert CMLPLTrainer(small, donate=False).config.gather_impl == "pool"


def test_trainers_resolve_auto_to_pool():
    for cls in (CMLPLTrainer, CPSTrainer, CCTTrainer):
        t = cls(CMLPLConfig(**TINY), donate=False)
        assert t.config.gather_impl == "pool", cls.__name__


def test_supervised_resolves_auto_to_xla():
    from cmlpl_tpu.models.zoo import build_model
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train.supervised import SupervisedTrainer

    spec = get_dataset("0")
    model, entry = build_model("basenet2", spec, n_pc=6)
    t = SupervisedTrainer(model, entry, patch_size=8, n_pc=6,
                          num_features=spec.num_bands)
    assert t.gather_impl == "xla"


def test_auto_equals_explicit_xla_numerics(tiny_scene, tiny_splits):
    """One fused step under the resolved pool default must equal the
    explicit-xla step bit-for-bit (the claim that lets "auto" keep the
    reference-numerics invariant)."""
    import jax

    rng = np.random.default_rng(0)
    n = tiny_scene.rows * tiny_scene.cols
    li = rng.integers(0, n, TINY["labeled_batch"])
    ly = rng.integers(0, TINY["num_classes"], TINY["labeled_batch"])
    ui = rng.integers(0, n, TINY["unlabeled_batch"])

    outs = {}
    for impl in ("auto", "xla"):
        kw = dict(TINY, num_classes=9, num_features=103,
                  n_pc=tiny_scene.n_pc, patch_size=tiny_scene.patch_size)
        t = CMLPLTrainer(CMLPLConfig(gather_impl=impl, **kw),
                         donate=False)
        assert t.config.gather_impl == ("pool" if impl == "auto" else impl)
        st = t.init_state(jax.random.key(0))
        st2, m = t.train_step(st, tiny_scene, li, ly, ui, epoch=1,
                              batch_index=0)
        outs[impl] = (jax.device_get(st2.net_b.params),
                      jax.device_get(m))
    jax.tree.map(np.testing.assert_array_equal,
                 outs["auto"][0], outs["xla"][0])
    assert (float(outs["auto"][1]["total_loss"])
            == float(outs["xla"][1]["total_loss"]))
