"""Data-prep parity against independent NumPy oracles of the reference
semantics (mirror pad, patch index arithmetic, PCA, normalisation)."""

import numpy as np
import pytest

from cmlpl_tpu.data.patches import (
    gather_patches,
    pad_symmetric,
    patch_pad_width,
)
from cmlpl_tpu.data.prep import feature_normalize, pca_norm, prepare_scene
from cmlpl_tpu.data.io import synthetic_scene


def mirror_pad_oracle(X, hw):
    """Oracle for the reference's MirrowCut (hyper_tools.py:35-55): build a
    3x3 tiling of flipped copies per band, crop to (row+2hw, col+2hw)."""
    row, col, nf = X.shape
    out = np.zeros((3 * row, 3 * col, nf))
    for i in range(nf):
        band = X[:, :, i]
        lr = np.fliplr(band)
        ud = np.flipud(band)
        lrud = np.fliplr(ud)
        top = np.concatenate([lrud, ud, lrud], axis=1)
        mid = np.concatenate([lr, band, lr], axis=1)
        out[:, :, i] = np.concatenate([top, mid, top], axis=0)
    return out[row - hw:2 * row + hw, col - hw:2 * col + hw, :]


def extract_patches_oracle(X, w):
    """Oracle for the reference patch loops (hyper_tools.py:226-243 even w,
    :300-317 odd w): for 1-based pixel counter i, slice the mirrored cube
    around (ceil(i/col)+hw-1, i-(row-1)*col+hw-1)."""
    even = w % 2 == 0
    hw = w // 2 if even else (w - 1) // 2
    row, col, nf = X.shape
    K = row * col
    Xm = mirror_pad_oracle(X, hw)
    XP = np.zeros((K, w, w, nf), dtype="float32")
    for i in range(1, K + 1):
        ir = int(np.ceil(i * 1.0 / col)) + hw - 1
        ic = i - (int(np.ceil(i * 1.0 / col)) - 1) * col + hw - 1
        if even:
            XP[i - 1] = Xm[ir - hw:ir + hw, ic - hw:ic + hw, :]
        else:
            XP[i - 1] = Xm[ir - hw:ir + hw + 1, ic - hw:ic + hw + 1, :]
    return XP


@pytest.mark.parametrize("hw", [1, 3, 10])
def test_pad_symmetric_matches_mirrowcut(rng, hw):
    # hw must be <= min(rows, cols): beyond that the reference's tile-crop
    # wraps negative slice indices and is simply out of its design domain
    X = rng.normal(size=(24, 11, 4))
    np.testing.assert_allclose(pad_symmetric(X, hw),
                               mirror_pad_oracle(X, hw))


@pytest.mark.parametrize("w", [20, 8, 9, 5])
def test_gather_patches_matches_reference_loop(rng, w):
    X = rng.normal(size=(11, 13, 3)).astype(np.float32)
    oracle = extract_patches_oracle(X, w)
    hw = patch_pad_width(w)
    padded = pad_symmetric(X, hw)
    idx = np.arange(11 * 13, dtype=np.int32)
    got = np.asarray(gather_patches(padded, idx, cols=13, w=w))
    np.testing.assert_allclose(got, oracle, rtol=1e-6)


def test_feature_normalize_zscore(rng):
    X = rng.normal(3.0, 2.0, size=(100, 7))
    Z = feature_normalize(X, 1)
    np.testing.assert_allclose(Z.mean(0), 0.0, atol=1e-10)
    np.testing.assert_allclose(Z.std(0), 1.0, atol=1e-10)


def test_feature_normalize_minmax(rng):
    X = rng.normal(size=(50, 3))
    Z = feature_normalize(X, 2)
    np.testing.assert_allclose(Z.min(0), 0.0, atol=1e-12)
    np.testing.assert_allclose(Z.max(0), 1.0, atol=1e-12)


def test_pca_norm_matches_reference_formula(rng):
    X = rng.normal(size=(500, 24))
    got = pca_norm(X, 6)
    # independent re-derivation of the same spec
    Xc = X - X.mean(0)
    U, _, _ = np.linalg.svd(np.cov(Xc.T))
    expected = Xc @ U[:, :6]
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    # components are decorrelated with decreasing variance
    var = got.var(0)
    assert np.all(np.diff(var) <= 1e-9)


def test_prepare_scene_shapes():
    cube, gt = synthetic_scene(0)
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=20, n_pc=16)
    assert scene.padded_pca.shape == (64 + 20, 48 + 20, 16)
    assert scene.spectra.shape == (64 * 48, 103)
    assert scene.labels.shape == (64 * 48,)
