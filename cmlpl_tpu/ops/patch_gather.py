"""Pallas TPU patch-gather kernel.

The hot data movement of the whole framework: gathering (B, w, w, C)
sliding-window patches from the HBM-resident padded PCA cube (the
reference instead materialises all patches to an 18.5 GiB array on disk,
``hyper_tools.py:226-243``).

The XLA fallback (vmap of ``lax.dynamic_slice``) lowers to a gather HLO;
this kernel instead issues strided DMAs per patch directly from the cube
in HBM into the output's VMEM blocks, BLOCK patches per grid step with a
DEPTH-deep in-flight DMA pipeline, coordinates streamed through SMEM.

Mosaic constraints encoded here:
- the DMA slice must cover whole 128-lane tiles in the minor (channel)
  dim -> the cube is lane-padded to C % 128 == 0 (``lane_pad_cube``);
- SMEM is ~1 MB -> coordinates are blocked per grid step instead of
  scalar-prefetching the whole index array.

Use :func:`gather_patches_pallas` on TPU; ``interpret=True`` runs the same
kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128   # TPU lane width: DMA minor-dim slices must cover full tiles
BLOCK = 16   # patches per grid step (out block = BLOCK*w*w*C floats)
DEPTH = 8    # in-flight DMAs


def _gather_kernel(w: int, block: int, depth: int, rc_ref, padded_ref,
                   out_ref, sems):
    def get_dma(j):
        return pltpu.make_async_copy(
            padded_ref.at[pl.ds(rc_ref[j, 0], w),
                          pl.ds(rc_ref[j, 1], w)],
            out_ref.at[j],
            sems.at[j % depth],
        )

    for d in range(min(depth, block)):
        get_dma(d).start()

    def body(j, _):
        get_dma(j).wait()

        @pl.when(j + depth < block)
        def _():
            get_dma(j + depth).start()

        return 0

    lax.fori_loop(0, block, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("cols", "w", "interpret", "block",
                                    "depth"))
def gather_patches_pallas(padded: jax.Array, pixel_idx: jax.Array, *,
                          cols: int, w: int, interpret: bool = False,
                          block: int = BLOCK,
                          depth: int = DEPTH) -> jax.Array:
    """Gather (B, w, w, C) patches for flat pixel indices (B,).

    Same contract as :func:`cmlpl_tpu.data.patches.gather_patches`.
    Hot callers should pass a pre-lane-padded cube (``lane_pad_cube``) so
    the channel pad is paid once, not per call.
    """
    b = pixel_idx.shape[0]
    ch = padded.shape[-1]
    if ch % LANE != 0 and not interpret:
        out = gather_patches_pallas(
            lane_pad_cube(padded), pixel_idx, cols=cols, w=w,
            interpret=interpret, block=block, depth=depth)
        return out[..., :ch]

    pad_b = (-b) % block
    if pad_b:
        out = gather_patches_pallas(
            padded, jnp.pad(pixel_idx, (0, pad_b)), cols=cols, w=w,
            interpret=interpret, block=block, depth=depth)
        return out[:b]

    r = (pixel_idx // cols).astype(jnp.int32)
    c = (pixel_idx % cols).astype(jnp.int32)
    rc = jnp.stack([r, c], axis=1)  # (B, 2)

    return pl.pallas_call(
        functools.partial(_gather_kernel, w, block, depth),
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((block, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((block, w, w, ch),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        out_shape=jax.ShapeDtypeStruct((b, w, w, ch), padded.dtype),
        interpret=interpret,
    )(rc, padded)


def lane_pad_cube(padded: jax.Array) -> jax.Array:
    """Pad the channel dim up to a multiple of 128 lanes (one-off cost for
    hot Pallas-gather callers)."""
    ch = padded.shape[-1]
    pad = (-ch) % LANE
    if pad == 0:
        return padded
    return jnp.pad(padded, ((0, 0), (0, 0), (0, pad)))


def _gather_kernel_shifted(w: int, span: int, align: int, block: int,
                           depth: int, rck_ref, cube8_ref, out_ref, sems):
    """bf16 variant: reads from the 8-column-shift cube (see
    ``build_shifted_cube_bf16``).  Mosaic constrains 16-bit DMA slices in
    the sublane (cols) dim to 8-aligned shapes AND statically-provably
    8-aligned offsets (measured on v5e: "Slice shape along dimension 1
    must be aligned to tiling (8)" / "Failed to prove that a tile index
    ... is divisible by the tiling (8)").  Reading shift-copy ``k = c % 8``
    at offset ``8 * (c // 8)`` satisfies both: the multiply-by-8 makes the
    offset provable, and the copy's k-column shift lands the patch at
    column 0 of the span, so the caller's ``[:, :, :w]`` slice is static.
    """

    def get_dma(j):
        return pltpu.make_async_copy(
            cube8_ref.at[rck_ref[j, 2],
                         pl.ds(rck_ref[j, 0], w),
                         pl.ds(rck_ref[j, 1] * align, span)],
            out_ref.at[j],
            sems.at[j % depth],
        )

    for d in range(min(depth, block)):
        get_dma(d).start()

    def body(j, _):
        get_dma(j).wait()

        @pl.when(j + depth < block)
        def _():
            get_dma(j + depth).start()

        return 0

    lax.fori_loop(0, block, body, 0)


ALIGN = 8  # measured Mosaic sublane-DMA granularity for 16-bit types


def build_shifted_cube_bf16(padded: jax.Array) -> jax.Array:
    """(8, rows, cols + span - w ..., 128) bf16 shift cube for
    :func:`gather_patches_pallas_shifted`: copy ``k`` is the lane-padded
    bf16 cube shifted left by ``k`` columns.  ~8 x cube-bytes/2 of HBM
    (PaviaU 60-PC: ~470 MB) buys DMA slices whose column offsets are
    provably 8-aligned.  Built once per dispatch (hoisted out of the
    training scans by ``make_train_gather``'s prep_cube contract)."""
    bf = lane_pad_cube(padded.astype(jnp.bfloat16))
    cols = bf.shape[1]
    pad = jnp.pad(bf, ((0, 0), (0, ALIGN + 7), (0, 0)))
    return jnp.stack([pad[:, k:k + cols + ALIGN - 1] for k in range(ALIGN)])


@functools.partial(jax.jit,
                   static_argnames=("cols", "w", "interpret", "block",
                                    "depth"))
def gather_patches_pallas_shifted(cube8: jax.Array, pixel_idx: jax.Array,
                                  *, cols: int, w: int,
                                  interpret: bool = False,
                                  block: int = BLOCK,
                                  depth: int = DEPTH) -> jax.Array:
    """Gather (B, w, w, 128) bf16 patches from the 8-shift cube.

    Same index contract as :func:`gather_patches_pallas` (flat pixel
    indices over the scene's ``cols``); the cube argument must come from
    :func:`build_shifted_cube_bf16`.  Moves w*span*128*2 bytes per patch
    (PaviaU w=20: 123 KB vs the f32 Pallas kernel's 205 KB and the ideal
    f32 60-channel 96 KB) through the DMA engines instead of the XLA
    per-patch while-loop."""
    b = pixel_idx.shape[0]
    ch = cube8.shape[-1]
    span = -(-w // ALIGN) * ALIGN

    pad_b = (-b) % block
    if pad_b:
        out = gather_patches_pallas_shifted(
            cube8, jnp.pad(pixel_idx, (0, pad_b)), cols=cols, w=w,
            interpret=interpret, block=block, depth=depth)
        return out[:b]

    r = (pixel_idx // cols).astype(jnp.int32)
    c = (pixel_idx % cols).astype(jnp.int32)
    rck = jnp.stack([r, c // ALIGN, c % ALIGN], axis=1)  # (B, 3)

    out = pl.pallas_call(
        functools.partial(_gather_kernel_shifted, w, span, ALIGN, block,
                          depth),
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((block, w, span, ch),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        out_shape=jax.ShapeDtypeStruct((b, w, span, ch), cube8.dtype),
        interpret=interpret,
    )(rck, cube8)
    return out[:, :, :w, :]


#: HBM budget for the pre-gathered training pool under gather_impl
#: "auto" — the pool is worth its footprint (+22.6% measured,
#: docs/BENCHMARKS.md "pre-gathered-pool") only while it stays a small
#: fraction of a chip's HBM (v5e: 16 GB).  At the reference schedule the
#: pool is ~0.97 GB, far under this.
POOL_AUTO_BUDGET_BYTES = 2 << 30

#: Pool length quantum (rows).  ``poolify_batches`` pads every pool to a
#: multiple of this so per-epoch dispatches keep a stable jitted shape
#: when the unique count jitters; ``resolve_gather_impl`` sizes its
#: worst case with the same constant so the two can't drift.
POOL_BUCKET = 512


def resolve_gather_impl(gather_impl: str, *, num_unlabel: int,
                        patch_size: int, n_pc: int, num_labeled: int = 0,
                        pool_supported: bool = True,
                        bucket: int = POOL_BUCKET) -> str:
    """Resolve the "auto" training-gather knob to a concrete impl.

    "auto" (the default since r3d) picks the pre-gathered-pool path —
    numerically identical to "xla" (same patch values, same math;
    equality pinned in tests) and +22.6% measured — whenever the trainer
    supports it and the pool's worst-case f32 footprint fits
    POOL_AUTO_BUDGET_BYTES; otherwise the HBM-free per-step "xla"
    dynamic-slice gather.  Explicit impl names pass through untouched.

    The worst case is derived from the actual schedule: a pool holds the
    UNIQUE pixels a dispatch trains on, which is at most ``num_unlabel``
    unlabeled + ``num_labeled`` labeled pixels (the split recipe draws
    ``num_label`` per class, sample_generation.py:52-63, so trainers pass
    ``num_label * num_classes``), rounded up to the ``poolify_batches``
    bucket.  The pool may be stored in bf16 under input_dtype="compute";
    the budget check keeps the conservative f32 footprint.
    """
    if gather_impl != "auto":
        return gather_impl
    if not pool_supported:
        return "xla"
    uniques = max(num_unlabel + num_labeled, 1)
    pool_rows = -(-uniques // bucket) * bucket
    pool_bytes = pool_rows * patch_size * patch_size * n_pc * 4
    return "pool" if pool_bytes <= POOL_AUTO_BUDGET_BYTES else "xla"


def check_gather_mesh(gather_impl: str, mesh) -> None:
    """pallas_call can't be GSPMD-partitioned (multi-chip inference uses
    shard_map instead, eval/inference.py); the training steps are
    GSPMD-jitted, so the Pallas gather knobs are single-chip only."""
    if gather_impl not in ("xla", "pool") and mesh is not None \
            and mesh.size > 1:
        raise ValueError(
            f"gather_impl={gather_impl!r} requires a single-device mesh "
            f"(got {mesh.size} devices); use gather_impl='xla' for "
            "multi-chip training")


def poolify_batches(lab_idx, unl_idx, bucket: int = POOL_BUCKET):
    """Pool-mode host prep: a dispatch's unique pixel ids + the batch
    index arrays re-expressed as positions into that pool.

    The pool is padded (repeating its first id) up to a multiple of
    ``bucket`` so the jitted graph's pool shape stays stable when the
    unique count jitters — per-EPOCH dispatches draw 9,984 of the 10,000
    tiled unlabeled samples, so their unique count varies by a few tens
    per epoch; without bucketing the checkpointing/resume path (one
    dispatch per epoch) would recompile every epoch.  Whole-run
    dispatches see the full pool (~10,045) and compile once either way."""
    import numpy as np

    li = np.asarray(lab_idx)
    ui = np.asarray(unl_idx)
    pool, inv = np.unique(np.concatenate([li.ravel(), ui.ravel()]),
                          return_inverse=True)
    li_pos = inv[:li.size].reshape(li.shape).astype(np.int32)
    ui_pos = inv[li.size:].reshape(ui.shape).astype(np.int32)
    padded_len = -(-len(pool) // bucket) * bucket
    pool = np.concatenate(
        [pool, np.full(padded_len - len(pool), pool[0], pool.dtype)])
    return pool.astype(np.int32), li_pos, ui_pos


def make_input_cast(compute_dtype: str, input_dtype: str):
    """Cast applied to gathered patches/spectra at the dispatch boundary
    (``CMLPLConfig.input_dtype``).  Identity unless compute_dtype is
    bfloat16 AND input_dtype is "compute" — then the patch pool / noise
    views are stored in bf16, halving their HBM traffic (the layers cast
    their inputs to bf16 anyway; only the rounding point moves)."""
    if compute_dtype == "bfloat16" and input_dtype == "compute":
        return lambda a: a.astype(jnp.bfloat16)
    if input_dtype not in ("compute", "float32"):
        raise ValueError(f"unknown input_dtype {input_dtype!r}")
    return lambda a: a


def make_train_gather(gather_impl: str, n_pc: int):
    """(prep_cube, gather) pair implementing the training gather knob
    (``CMLPLConfig.gather_impl``) for any trainer's fused step.

    ``prep_cube`` is the one-off per-dispatch cube transform (identity for
    "xla"; bf16 cast and/or 128-lane channel pad for the Pallas variants)
    — call it once at each jitted entry point, OUTSIDE the step scans, so
    the cost is paid per dispatch, not per step.

    ``gather(prepped, pixel_idx, cols, w)`` always returns f32 patches
    with ``n_pc`` channels, whatever the cube storage — downstream
    training math is identical across impls up to bf16 INPUT quantisation
    in "pallas_bf16".
    """
    if gather_impl == "xla":
        def prep_cube(padded):
            return padded

        def gather(prepped, pixel_idx, cols, w):
            r = pixel_idx // cols
            c = pixel_idx % cols

            def one(ri, ci):
                return jax.lax.dynamic_slice(
                    prepped, (ri, ci, 0), (w, w, prepped.shape[-1]))

            return jax.vmap(one)(r, c)

        return prep_cube, gather

    if gather_impl == "pallas_bf16":
        # 16-bit DMA slices need 8-aligned column offsets/shapes -> read
        # from the 8-shift cube (see _gather_kernel_shifted's docstring)
        def prep_cube(padded):
            return build_shifted_cube_bf16(padded)

        def gather(cube8, pixel_idx, cols, w):
            interp = jax.default_backend() not in ("tpu", "axon")
            out = gather_patches_pallas_shifted(
                cube8, pixel_idx, cols=cols, w=w, interpret=interp)
            return out[..., :n_pc].astype(jnp.float32)

        return prep_cube, gather

    if gather_impl == "pool":
        raise ValueError(
            "gather_impl='pool' (pre-gathered training pool) is handled "
            "inside the CMLPL/CPS/CCT trainers' _build_step, not by "
            "make_train_gather")
    if gather_impl != "pallas":
        raise ValueError(f"unknown gather_impl {gather_impl!r}")

    def prep_cube(padded):
        return lane_pad_cube(padded)

    def gather(prepped, pixel_idx, cols, w):
        interp = jax.default_backend() not in ("tpu", "axon")
        out = gather_patches_pallas(prepped, pixel_idx, cols=cols, w=w,
                                    interpret=interp)
        return out[..., :n_pc].astype(jnp.float32)

    return prep_cube, gather


def gather_patches_auto(padded: jax.Array, pixel_idx: jax.Array, *,
                        cols: int, w: int) -> jax.Array:
    """Pallas on TPU, XLA gather elsewhere."""
    from cmlpl_tpu.data.patches import gather_patches

    platform = jax.default_backend()
    if platform in ("tpu", "axon"):
        return gather_patches_pallas(padded, pixel_idx, cols=cols, w=w)
    return gather_patches(padded, pixel_idx, cols=cols, w=w)
