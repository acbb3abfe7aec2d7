"""Device mesh + sharding helpers.

The reference is single-GPU (``train.py:12`` pins CUDA device 0) with no
distributed backend.  The TPU-native scaling story is a single
``jax.sharding.Mesh`` over all chips:

- training batches are sharded over the ``data`` axis; parameters, optimizer
  state and the pseudo-label queues are replicated (they are KB–MB sized),
  and XLA inserts the gradient ``psum`` over ICI automatically;
- full-scene inference shards the pixel grid over ``data``.

Multi-host pods only need ``jax.distributed.initialize`` before mesh
creation — no NCCL/MPI analog exists or is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def create_mesh_2d(devices: Optional[Sequence[jax.Device]] = None,
                   tp: int = 1) -> Mesh:
    """A ("data", "model") mesh: data parallel x tensor parallel.

    The model axis shards the wide spectral dimension (the 1024-d
    ``feat_spe`` activations/weights and the pseudo-label queue features)
    — see CMLPLTrainer.state_shardings.  ``tp`` must divide the device
    count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % tp == 0, f"tp={tp} must divide device count {n}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch / pixel) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a pytree of host arrays, sharding dim 0 over the mesh."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return ((n + m - 1) // m) * m
