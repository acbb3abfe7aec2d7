"""Patch geometry + on-device patch gather.

Reference semantics (``tools/hyper_tools.py:226-243`` ExtractPatches and
``:300-317`` ExtractPatches_for_base), reduced to closed form: for pixel
``k`` at (r, c) = (k // cols, k % cols), the patch is

    padded[r : r + w,  c : c + w,  :]

where ``padded`` is the scene symmetric-padded by ``hw`` on each side,
``hw = w // 2`` for even w (pixel sits asymmetrically at offset (hw, hw) of
a [c-hw, c+hw) window — the reference's even-w=20 quirk) and
``hw = (w - 1) // 2`` for odd w (centered window).  Both cases collapse to
the same slice arithmetic in padded coordinates, which the unit tests pin
against a NumPy oracle of the reference's index loop.

The gather runs inside jit over the HBM-resident padded cube, so the full
(K, w, w, n_pc) patch tensor (18.5 GiB for PaviaU) never exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def patch_pad_width(w: int) -> int:
    """Mirror-pad halfwidth for patch size w (reference hyper_tools.py:227,
    :301)."""
    return w // 2 if w % 2 == 0 else (w - 1) // 2


def pad_symmetric(x: np.ndarray, hw: int) -> np.ndarray:
    """Symmetric (edge-inclusive reflect) pad of the two leading spatial
    dims.  Equivalent to the reference's flip-tile-crop ``MirrowCut``
    (``hyper_tools.py:35-55``) for hw <= min(rows, cols), without the
    per-band Python loop or the 9x intermediate.
    """
    return np.pad(x, ((hw, hw), (hw, hw), (0, 0)), mode="symmetric")


@functools.partial(jax.jit, static_argnames=("cols", "w"))
def gather_patches(padded: jax.Array, pixel_idx: jax.Array, *, cols: int,
                   w: int) -> jax.Array:
    """Gather (B, w, w, C) patches for flat pixel indices (B,).

    ``padded`` is (rows + 2hw, cols + 2hw, C); patch top-left in padded
    coordinates is exactly (r, c) — see module docstring.
    """
    r = pixel_idx // cols
    c = pixel_idx % cols

    def one(ri, ci):
        return jax.lax.dynamic_slice(
            padded, (ri, ci, 0), (w, w, padded.shape[-1]))

    return jax.vmap(one)(r, c)


def gather_spectra(spectra: jax.Array, pixel_idx: jax.Array) -> jax.Array:
    """Gather (B, bands) z-scored spectra rows for flat pixel indices."""
    return jnp.take(spectra, pixel_idx, axis=0)
