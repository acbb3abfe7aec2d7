"""Epoch sampler semantics vs the reference's HSIDataSet tiling
(hsi_loader.py:29-45)."""

import numpy as np

from cmlpl_tpu.data.pipeline import SemiSupervisedSampler, _tile_to
from cmlpl_tpu.data.splits import Splits


def tile_oracle(idx, max_iters):
    """Reference tiling: np.concatenate((np.tile(idx, n_repeat),
    idx[:part_num])) with n_repeat = max_iters // len, part = remainder."""
    n_repeat = int(max_iters / len(idx))
    part_num = max_iters - n_repeat * len(idx)
    return np.concatenate((np.tile(idx, n_repeat), idx[:part_num]))


def test_tile_to_matches_reference():
    idx = np.arange(45) * 7
    for n in [45, 100, 10000, 44, 1]:
        np.testing.assert_array_equal(_tile_to(idx, n),
                                      tile_oracle(idx, n))


def test_sampler_epoch_structure():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 10, size=4000)
    labeled = np.where(labels == 3)[0][:45]
    unlabeled = np.where(labels > 0)[0][:500]
    splits = Splits(train=labeled, test=np.array([0]), unlabeled=unlabeled)
    s = SemiSupervisedSampler(splits, labels, labeled_batch=128,
                              unlabeled_batch=128, num_unlabel=1000)
    # reference: min(ceil-style loader lengths) with drop-last semantics
    assert s.batches_per_epoch == 1000 // 128
    batches = list(s.epoch())
    assert len(batches) == s.batches_per_epoch
    for li, ly, ui in batches:
        assert li.shape == (128,) and ui.shape == (128,)
        # labeled indices come only from the (tiled) train split
        assert set(li).issubset(set(labeled))
        # labels are 0-based
        np.testing.assert_array_equal(ly, labels[li] - 1)
        # unlabeled truncated to num_unlabel pool
        assert set(ui).issubset(set(unlabeled[:1000]))


def test_sampler_epochs_reshuffle():
    rng = np.random.default_rng(1)
    labels = rng.integers(1, 5, size=1000)
    idx = np.arange(1000)
    splits = Splits(train=idx[:40], test=idx[40:50], unlabeled=idx[50:])
    s = SemiSupervisedSampler(splits, labels, 8, 8, num_unlabel=64)
    e1 = [b[0] for b in s.epoch()]
    e2 = [b[0] for b in s.epoch()]
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))
