"""Split generation must be byte-identical to the reference algorithm
(sample_generation.py:43-65) — it is the de-facto regression fixture."""

import numpy as np

from cmlpl_tpu.data.splits import generate_splits


def split_oracle(Y, num_label):
    """Independent oracle of the reference split procedure."""
    Y = Y.reshape(-1)
    n_class = int(Y.max())
    np.random.seed(2)
    whole = np.where(Y > 0)[0]
    np.random.shuffle(whole)
    train = None
    test = None
    for i in range(1, n_class + 1):
        index = np.where(Y == i)[0]
        np.random.seed(0)
        perm = np.random.permutation(index.shape[0])
        tr = index[perm[:num_label]]
        te = index[perm[num_label:]]
        train = tr if train is None else np.append(train, tr)
        test = te if test is None else np.append(test, te)
    unl = np.array(list(set(whole) - set(train)))
    return train, test, unl


def _fake_labels(seed=3, n=5000, ncls=9):
    rng = np.random.default_rng(seed)
    return rng.integers(0, ncls + 1, size=n)


def test_splits_byte_identical_to_reference():
    Y = _fake_labels()
    train, test, unl = split_oracle(Y.copy(), 5)
    got = generate_splits(Y, num_label=5)
    np.testing.assert_array_equal(got.train, train)
    np.testing.assert_array_equal(got.test, test)
    np.testing.assert_array_equal(got.unlabeled, unl)


def test_splits_counts_and_disjoint():
    Y = _fake_labels(seed=11)
    s = generate_splits(Y, num_label=7)
    assert s.train.shape[0] == 7 * int(Y.max())
    # train/test partition the labeled pixels per class
    labeled = np.where(Y > 0)[0]
    assert set(s.train) | set(s.test) == set(labeled)
    assert not set(s.train) & set(s.test)
    # unlabeled excludes train
    assert not set(s.unlabeled) & set(s.train)


def test_splits_deterministic():
    Y = _fake_labels(seed=5)
    a = generate_splits(Y, num_label=5)
    b = generate_splits(Y, num_label=5)
    np.testing.assert_array_equal(a.train, b.train)
    np.testing.assert_array_equal(a.unlabeled, b.unlabeled)


def test_load_splits_roundtrip(tiny_scene, tmp_path):
    """A reference dataset/<name>/ dir (as written by the
    sample_generation CLI) loads back byte-identically, and the training
    CLIs' --splits_dir path uses it."""
    import argparse
    import os

    import numpy as np

    from cmlpl_tpu.data import generate_splits, load_splits

    want = generate_splits(tiny_scene.labels, num_label=5)
    np.save(os.path.join(tmp_path, "train_array.npy"), want.train)
    np.save(os.path.join(tmp_path, "test_array.npy"), want.test)
    np.save(os.path.join(tmp_path, "unlabel_array.npy"), want.unlabeled)

    got = load_splits(str(tmp_path))
    np.testing.assert_array_equal(got.train, want.train)
    np.testing.assert_array_equal(got.test, want.test)
    np.testing.assert_array_equal(got.unlabeled, want.unlabeled)

    # the CLI plumbing honors --splits_dir
    from cmlpl_tpu.cli._common import build_data

    args = argparse.Namespace(
        dataID="0", data_root=".", w=tiny_scene.patch_size,
        n_PC=tiny_scene.n_pc, num_label=3, splits_dir=str(tmp_path),
        labeled_batch_size=8, unlabeled_batch_size=8, num_unlabel=32,
        seed=1088)
    _, _, splits, _ = build_data(args)
    np.testing.assert_array_equal(splits.train, want.train)
