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

# persistent compilation cache: XLA:CPU compiles dominate suite wall time
# on this 1-vCPU host; a warm cache cuts repeated runs ~38% (measured on
# test_train_step.py: 79 s -> 48 s).  Repo-local dir (gitignored) so the
# cache survives across runs; opt out with CMLPL_NO_COMPILE_CACHE=1.
# Cached AOT results execute the same numerics (oracle tests would catch
# anything else).  XLA's cpu_aot_loader logs a spurious machine-feature
# E-line per cache load (the compile-side feature string carries
# compiler-preference pseudo-features like +prefer-no-scatter that the
# host probe never reports — same machine both sides); TF_CPP_MIN_LOG_
# LEVEL=3 silences that spam for tests only.  Python exceptions and
# FATAL aborts stay visible.
if not os.environ.get("CMLPL_NO_COMPILE_CACHE"):
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # subprocess tests (pod workers, CLI subprocesses) inherit the cache
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "1.0")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

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
