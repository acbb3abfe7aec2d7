"""Native C++ host kernels vs NumPy oracles."""

import numpy as np
import pytest

from cmlpl_tpu.data.patches import pad_symmetric
from cmlpl_tpu.native import (
    extract_patches_native,
    native_available,
    pad_symmetric_native,
)


def test_native_builds():
    assert native_available(), "g++ build of patch_ops.cpp failed"


def test_pad_symmetric_native_matches_numpy(rng):
    x = rng.normal(size=(13, 9, 5)).astype(np.float32)
    np.testing.assert_allclose(pad_symmetric_native(x, 4),
                               pad_symmetric(x, 4))


@pytest.mark.parametrize("layout", ["nchw", "nhwc"])
@pytest.mark.parametrize("w", [20, 9])
def test_extract_patches_native(rng, layout, w):
    rows, cols, ch = 11, 13, 3
    x = rng.normal(size=(rows, cols, ch)).astype(np.float32)
    hw = w // 2 if w % 2 == 0 else (w - 1) // 2
    padded = pad_symmetric(x, hw).astype(np.float32)
    got = extract_patches_native(padded, rows, cols, w, layout=layout)

    # oracle via the (tested) slice arithmetic
    for k in [0, 5, cols, rows * cols - 1]:
        r, c = k // cols, k % cols
        want = padded[r:r + w, c:c + w, :]
        if layout == "nchw":
            np.testing.assert_allclose(got[k], np.moveaxis(want, 2, 0))
        else:
            np.testing.assert_allclose(got[k], want)


def test_native_matches_stride_fallback(rng, monkeypatch):
    rows, cols, ch, w = 7, 8, 4, 6
    x = rng.normal(size=(rows, cols, ch)).astype(np.float32)
    padded = pad_symmetric(x, 3).astype(np.float32)
    native = extract_patches_native(padded, rows, cols, w, layout="nchw")

    import cmlpl_tpu.native.binding as binding

    monkeypatch.setattr(binding, "_get_lib", lambda: None)
    fallback = binding.extract_patches_native(padded, rows, cols, w,
                                              layout="nchw")
    np.testing.assert_allclose(native, fallback)
