"""Test harness: force CPU with 8 virtual devices BEFORE jax initialises.

This is JAX's standard fake-multi-device fixture — the TPU answer to
"test multi-chip without a pod" (SURVEY §4).
"""

import os

# force-override: the image pins JAX_PLATFORMS=axon (the TPU tunnel), but
# tests run on a virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the image's sitecustomize registers the axon TPU backend and overwrites
# jax_platforms to "axon,cpu"; force CPU explicitly (must happen before any
# backend is initialised)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_scene():
    """A small prepared synthetic scene shared across tests."""
    from cmlpl_tpu.data import prepare_scene, synthetic_scene

    cube, gt = synthetic_scene(0)  # 64 x 48 x 103, 9 classes
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=20, n_pc=16)
    return scene


@pytest.fixture(scope="session")
def tiny_splits(tiny_scene):
    from cmlpl_tpu.data import generate_splits

    return generate_splits(tiny_scene.labels, num_label=5)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
