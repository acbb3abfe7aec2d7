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
