"""Checkpoint / resume via orbax.

The reference has **no** checkpointing (grep-verified: no torch.save/load of
weights; results persist only as SVG + CSV, train.py:308-314,342-345) — this
is a required addition per SURVEY §5, not a port.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _is_key(a) -> bool:
    return (hasattr(a, "dtype")
            and jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key))


def _keys_to_data(tree):
    """Typed PRNG keys -> raw uint32 key data.  Orbax cannot serialize
    host-local key arrays (visible under multi-process/pod runs); the raw
    data is a plain array and portable across PRNG impls recorded by the
    restore template."""
    return jax.tree_util.tree_map(
        lambda a: np.asarray(jax.random.key_data(a)) if _is_key(a) else a,
        tree)


def _data_to_keys(template, restored):
    return jax.tree_util.tree_map(
        lambda t, r: (jax.random.wrap_key_data(
            r, impl=jax.random.key_impl(t)) if _is_key(t) else r),
        template, restored)


def save_checkpoint(directory: str, state: Any, step: int | None = None
                    ) -> str:
    """Save a pytree train state; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if step is None:
        step = int(jax.device_get(getattr(state, "step", 0)))
    path = os.path.join(directory, str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _keys_to_data(jax.device_get(state)), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str, target: Any, step: int | None = None
                       ) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete
    state pytree)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if step is None:
        steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        step = max(steps)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(directory, str(step)),
                             _keys_to_data(target))
    return _data_to_keys(target, restored)
