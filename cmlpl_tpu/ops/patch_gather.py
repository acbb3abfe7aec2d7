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


def gather_patches_auto(padded: jax.Array, pixel_idx: jax.Array, *,
                        cols: int, w: int) -> jax.Array:
    """Pallas on TPU, XLA gather elsewhere."""
    from cmlpl_tpu.data.patches import gather_patches

    platform = jax.default_backend()
    if platform in ("tpu", "axon"):
        return gather_patches_pallas(padded, pixel_idx, cols=cols, w=w)
    return gather_patches(padded, pixel_idx, cols=cols, w=w)
