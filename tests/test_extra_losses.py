"""Opt-in extra objectives + augmentations are invocable end to end
(the reference imports these but never calls them: trian_CPS.py:15-19
loss_helper imports, models.py:14-39 ContrastiveLoss, the missing
`regularizer` MMD, hsi_loader.py:58-107 dead augmentations)."""

import jax
import numpy as np
import pytest

from cmlpl_tpu.data import SemiSupervisedSampler
from cmlpl_tpu.train import CMLPLConfig, CMLPLTrainer


def _cfg(scene, **kw):
    return CMLPLConfig(num_classes=9, num_features=103, n_pc=scene.n_pc,
                       patch_size=scene.patch_size, labeled_batch=8,
                       unlabeled_batch=8, num_unlabel=32, num_epochs=1,
                       **kw)


@pytest.mark.parametrize("extra", ["memobank", "mmd", "ntxent"])
def test_extra_loss_trains_and_is_finite(tiny_scene, tiny_splits, extra):
    cfg = _cfg(tiny_scene, extra_loss=extra, extra_weight=0.1)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    sampler = SemiSupervisedSampler(tiny_splits, tiny_scene.labels, 8, 8,
                                    num_unlabel=32)
    li, ly, ui = next(iter(sampler.epoch()))
    # several steps: a NaN in the extra term's BACKWARD (e.g. an
    # unguarded l2-norm of a zero prototype) only shows up in the params
    # on the next step's forward
    for i in range(3):
        state, m = trainer.train_step(state, tiny_scene, li, ly, ui, 1, i)
        assert "extra_loss" in m
        assert np.isfinite(float(m["extra_loss"])), f"step {i}"
        assert np.isfinite(float(m["total_loss"])), f"step {i}"
        assert np.isfinite(float(m["cls_loss"])), f"step {i}"
    # the weighted term really entered the objective
    base_cfg = _cfg(tiny_scene)
    base = CMLPLTrainer(base_cfg, donate=False)
    bstate = base.init_state(jax.random.key(0))
    _, mb = base.train_step(bstate, tiny_scene, li, ly, ui, 1, 0)
    if float(m["extra_loss"]) != 0.0:
        assert float(m["total_loss"]) != pytest.approx(
            float(mb["total_loss"]))


def test_memobank_state_updates(tiny_scene, tiny_splits):
    cfg = _cfg(tiny_scene, extra_loss="memobank")
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    assert state.bank != ()
    sampler = SemiSupervisedSampler(tiny_splits, tiny_scene.labels, 8, 8,
                                    num_unlabel=32)
    li, ly, ui = next(iter(sampler.epoch()))
    new_state, _ = trainer.train_step(state, tiny_scene, li, ly, ui, 1, 0)
    # negatives were pushed into at least one class FIFO
    assert int(np.sum(np.asarray(new_state.bank.count))) > 0


def test_augment_flags_reach_the_step(tiny_scene, tiny_splits):
    cfg = _cfg(tiny_scene, augment=("flip", "rot90", "radiation",
                                    "mixture"), noise=0.0, dropout=0.0)
    trainer = CMLPLTrainer(cfg, donate=False)
    state = trainer.init_state(jax.random.key(0))
    sampler = SemiSupervisedSampler(tiny_splits, tiny_scene.labels, 8, 8,
                                    num_unlabel=32)
    li, ly, ui = next(iter(sampler.epoch()))
    _, m_aug = trainer.train_step(state, tiny_scene, li, ly, ui, 0, 0)

    plain = CMLPLTrainer(_cfg(tiny_scene, noise=0.0, dropout=0.0),
                         donate=False)
    pstate = plain.init_state(jax.random.key(0))
    _, m_plain = plain.train_step(pstate, tiny_scene, li, ly, ui, 0, 0)
    # same params/data/seed: only the augmentation differs
    assert float(m_aug["cls_loss"]) != pytest.approx(
        float(m_plain["cls_loss"]))
    assert np.isfinite(float(m_aug["total_loss"]))


def test_extra_loss_cli_end_to_end(tmp_path, monkeypatch):
    from cmlpl_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    acc_b, _ = main(["--dataID", "0", "--n_PC", "16", "--num_epochs", "2",
                     "--labeled_batch_size", "16",
                     "--unlabeled_batch_size", "16", "--num_unlabel", "64",
                     "--val_batch_size", "256", "--dropout", "0.5",
                     "--print_per_batches", "0",
                     "--extra_loss", "ntxent", "--extra_weight", "0.05",
                     "--augment", "flip", "rot90"])
    assert 0.0 <= acc_b.oa <= 1.0
