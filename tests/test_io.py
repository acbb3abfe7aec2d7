"""Scene IO: scipy .mat, MATLAB v7.3 (h5py), synthetic fallback."""

import os
import warnings

import numpy as np
import pytest

from cmlpl_tpu.data.io import _load_mat_key, load_scene, synthetic_scene
from cmlpl_tpu.registry import get_dataset


def test_scipy_mat_roundtrip(tmp_path, rng):
    import scipy.io as sio

    X = rng.normal(size=(7, 5, 3))
    path = os.path.join(tmp_path, "cube.mat")
    sio.savemat(path, {"paviaU": X})
    got = _load_mat_key(path, "paviaU", hdf5=False)
    np.testing.assert_allclose(got, X)


def test_hdf5_mat_roundtrip(tmp_path, rng):
    import h5py

    X = rng.normal(size=(7, 5, 3))
    path = os.path.join(tmp_path, "indian.mat")
    # MATLAB v7.3 stores transposed; mimic that convention
    with h5py.File(path, "w") as f:
        f["indian_pines_corrected"] = X.T
    got = _load_mat_key(path, "indian_pines_corrected", hdf5=True)
    np.testing.assert_allclose(got, X)


def test_load_scene_real_files(tmp_path, rng):
    import scipy.io as sio

    spec = get_dataset(1)
    X = rng.normal(size=(10, 8, 103))
    Y = rng.integers(0, 10, size=(10, 8))
    sio.savemat(os.path.join(tmp_path, spec.cube_file), {spec.cube_key: X})
    sio.savemat(os.path.join(tmp_path, spec.gt_file), {spec.gt_key: Y})
    got_x, got_y = load_scene(1, str(tmp_path))
    np.testing.assert_allclose(got_x, X)
    np.testing.assert_array_equal(got_y, Y)


def test_load_scene_missing_files_warns(tmp_path):
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        X, Y = load_scene(1, str(tmp_path))
    assert any("SYNTHETIC" in str(w.message) for w in caught)
    assert X.shape == (610, 340, 103)


def test_synthetic_scene_deterministic():
    a, _ = synthetic_scene(0, seed=7)
    b, _ = synthetic_scene(0, seed=7)
    np.testing.assert_array_equal(a, b)
    c, _ = synthetic_scene(0, seed=8)
    assert not np.array_equal(a, c)


def test_format_fallback_v5_behind_hdf5_flag(tmp_path, rng):
    """Public Indian Pines is MATLAB v5 though the registry (matching the
    reference's hdf5storage use) marks it hdf5 — loader must fall back."""
    import scipy.io as sio

    X = rng.normal(size=(6, 4, 3))
    path = os.path.join(tmp_path, "ip.mat")
    sio.savemat(path, {"indian_pines_corrected": X})
    got = _load_mat_key(path, "indian_pines_corrected", hdf5=True)
    np.testing.assert_allclose(got, X)


def test_format_fallback_v73_behind_scipy_flag(tmp_path, rng):
    """A v7.3 file behind hdf5=False must fall back to h5py (+transpose)."""
    import h5py

    X = rng.normal(size=(6, 4, 3))
    path = os.path.join(tmp_path, "cube73.mat")
    with h5py.File(path, "w") as f:
        f["paviaU"] = X.T
    got = _load_mat_key(path, "paviaU", hdf5=False)
    np.testing.assert_allclose(got, X)
