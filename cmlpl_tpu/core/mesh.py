"""Device mesh + sharding helpers.

The reference is single-GPU (``train.py:12`` pins CUDA device 0) with no
distributed backend.  The TPU-native scaling story is a single
``jax.sharding.Mesh`` over all chips:

- training batches are sharded over the ``data`` axis; parameters, optimizer
  state and the pseudo-label queues are replicated (they are KB–MB sized),
  and XLA inserts the gradient ``psum`` over ICI automatically;
- full-scene inference shards the pixel grid over ``data``.

Multi-host pods: call :func:`initialize_multihost` (the CLIs'
``--multihost`` flag) before mesh creation — no NCCL/MPI analog exists
or is needed; XLA collectives over ICI/DCN are the backend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Multi-host pod entry point: call ``jax.distributed.initialize``
    BEFORE any backend/mesh creation so every host contributes its local
    chips to the global ``jax.devices()`` view.

    On TPU pods the three arguments are auto-discovered from the
    environment; on other platforms pass them explicitly (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Single-process calls (num_processes in (None, 0, 1) with no
    coordinator) are a guarded no-op, so the same CLI command works on
    one host and on a pod.  Returns the process count in effect.
    """
    import os

    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or None
    if coordinator_address is None and (num_processes or 1) <= 1:
        return 1  # single process: nothing to initialize
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if jax.distributed.is_initialized():
        # already joined the cluster (e.g. two CLI mains in one process,
        # as a resume-after-train driver does): idempotent by design
        return jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return jax.process_count()


def is_multiprocess(mesh: Optional[Mesh]) -> bool:
    """True when the mesh spans devices of more than one process (a pod):
    host arrays must then be formed as global arrays
    (:func:`host_to_global`) — ``jax.device_put`` only accepts
    addressable shardings."""
    if mesh is None:
        return False
    return any(d.process_index != jax.process_index()
               for d in mesh.devices.flat)


def host_to_global(sharding, arr) -> jax.Array:
    """Form a (multi-process) global array from an identical host copy on
    every process.  Every process must call this with the SAME values
    (our batches/state are derived from shared seeds, so they are).
    Handles typed PRNG key arrays."""
    if hasattr(arr, "dtype") and jax.dtypes.issubdtype(
            arr.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(arr))
        impl = jax.random.key_impl(arr)
        g = jax.make_array_from_callback(data.shape, sharding,
                                         lambda idx: data[idx])
        return jax.random.wrap_key_data(g, impl=impl)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def basenet_tp_shardings(mesh: Mesh, template):
    """Tensor-parallel sharding tree for a BaseNet2-family param (or Adam
    moment) pytree on a ("data", "model") mesh.

    The wide spectral path is the only tensor worth sharding at this
    model scale: ``feat_spe`` (bands -> 1024) is column-sharded over
    "model" (output features + bias), and the ``classifier`` kernel is
    row-sharded on its contraction dim (the 2624-d concat whose spectral
    half arrives "model"-sharded).  Everything else (the small convs, BN
    stats) is replicated.  GSPMD then inserts the TP collectives: psum
    for the l2-norm and classifier contractions, all-gathers where
    replicated activations are needed.  Falls back to fully-replicated
    when the mesh has no "model" axis, so the same call works on 1-D dp
    meshes.  Adam moments inherit their parameter's sharding via the
    same path rules (pass the opt-state tree)."""
    repl = replicated_sharding(mesh)
    if "model" not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: repl, template)
    from jax.tree_util import tree_map_with_path

    def rule(path, leaf):
        names = "/".join(str(getattr(k, "key", k)) for k in path)
        if "feat_spe" in names and leaf.ndim == 2:
            return NamedSharding(mesh, P(None, "model"))
        if "feat_spe" in names and leaf.ndim == 1:
            return NamedSharding(mesh, P("model"))
        if "classifier" in names and leaf.ndim == 2:
            return NamedSharding(mesh, P("model", None))
        return repl

    return tree_map_with_path(rule, template)


def assert_tp_placed(params, what: str = "params") -> None:
    """Fail loudly if tensor parallelism silently degraded to
    replication: checks that the ``feat_spe`` kernel of ``params`` is
    actually laid out over the "model" axis (used by dryrun_multichip on
    2-D meshes)."""
    kern = params["feat_spe"]["kernel"]
    spec = getattr(kern.sharding, "spec", ())
    placed = any(ax == "model" or (isinstance(ax, tuple) and "model" in ax)
                 for ax in tuple(spec))
    assert placed, (
        f"{what}: feat_spe kernel is not sharded over the 'model' axis "
        f"(sharding={kern.sharding}); TP degraded to replication")


def place_state(mesh: Optional[Mesh], state, sh_tree=None):
    """Place a host-local state pytree (e.g. a restored checkpoint) onto
    ``mesh`` — pod-safe.

    On a multi-process mesh the trainers' jitted fns have in_shardings
    spanning non-addressable devices; ``jax.device_put`` rejects those,
    so every leaf is formed as a global array via :func:`host_to_global`
    (all processes restore the same checkpoint bytes, so host copies
    agree).  ``sh_tree`` supplies per-leaf shardings (a trainer's TP
    state-sharding tree); default fully replicated.  No-op without a
    mesh."""
    if mesh is None:
        return state
    if sh_tree is None:
        repl = replicated_sharding(mesh)
        sh_tree = jax.tree_util.tree_map(lambda _: repl, state)
    if is_multiprocess(mesh):
        return jax.tree_util.tree_map(
            lambda a, sh: host_to_global(sh, a), state, sh_tree)
    return jax.device_put(state, sh_tree)


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
