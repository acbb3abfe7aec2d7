"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock prints around inference
(``train.py:290-293``) and an assigned-but-unread ``tem_time``
(``train.py:151,279``).  Rebuild additions: a jax.profiler trace context and
a step timer that blocks on device completion so step times are honest.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Measures per-step wall time, synchronising on a device array.

    Note: on remote-attached TPUs (e.g. the axon tunnel),
    ``jax.block_until_ready`` can return at *enqueue* time; passing
    ``sync_on`` fetches one element to host, which is the only honest
    completion barrier there.
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            leaf = jax.tree_util.tree_leaves(sync_on)[0]
            _ = jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel")
                               else leaf)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
