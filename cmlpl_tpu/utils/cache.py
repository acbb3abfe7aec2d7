"""Repo-local persistent XLA compilation cache.

Compiles dominate wall time on this host twice over: XLA:CPU compiles on
the 1-vCPU driver host (a warm cache cut repeated suite runs ~38%,
tests/conftest.py), and Mosaic remote compiles on the tunneled TPU make
bench.py ~12 min cold vs ~3 min warm (CLAUDE.md).  The TPU relay also
comes and goes (round-3e outage record) — when a hardware window opens,
every minute spent recompiling is a minute not measuring, so the
hardware-facing entry points (bench.py, scripts/reference_oracle.py)
enable the same repo-local cache the test suite and the driver dryrun
already use (tests/conftest.py, __graft_entry__.py).

Cached executables run the same numerics (the oracle tests would catch
anything else); backends that cannot serialize executables simply skip
the cache.  Opt out with CMLPL_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compile_cache() -> None:
    """Point JAX at the repo-local ``.jax_cache`` (gitignored).

    Safe to call before or after backend init; also exports the env vars
    so subprocesses (pod workers, CLI subprocesses, the native host's
    exporting python) inherit the cache.  Never raises: the cache is an
    optimisation, not a gate.
    """
    if os.environ.get("CMLPL_NO_COMPILE_CACHE"):
        return
    cache = os.path.join(_REPO, ".jax_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
        os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    except Exception:
        pass
