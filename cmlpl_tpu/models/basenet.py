"""The trained model family (reference ``tools/models.py``).

Topology parity with the reference matters for OA parity, so layer shapes
match exactly; layout is TPU-idiomatic NHWC and the spatial branch's flatten
order is (H, W, C) instead of torch's (C, H, W) — a fixed permutation of the
classifier's input that is irrelevant when training from scratch.

- :class:`BaseNet2` — the CMLPL backbone (models.py:97-152): dual-input
  spectral-spatial CNN returning (logits, l2-normalised 1024-d spectral
  feature).
- :class:`CCTNet` — same stem, returns the 2624-d joint feature twice
  (models.py:229-287); its internal decoder reconstruction is computed and
  discarded by the reference (models.py:285) — we expose it optionally
  instead of wasting the FLOPs by default.
- :class:`Decoder` — spectrum + patch reconstruction head (models.py:289-320).
- :class:`LinearClassifier` — 2624 -> classes head (models.py:322-330).
- :class:`BaseNet1` — simpler dual-branch variant from the comparison zoo
  (conpared_models.py:192-247).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from cmlpl_tpu.models.common import avg_pool2, l2_normalize, tconv, tdense

FEAT_DIM = 1024       # spectral feature width (models.py:119)
JOINT_DIM = 2624      # 64 * 5 * 5 + 1024 (models.py:127)


class BaseNet2(nn.Module):
    """Dual-branch spectral-spatial CNN.

    Inputs: ``xp`` (B, w, w, n_pc) PCA patch (NHWC), ``x`` (B, bands)
    spectrum.  Returns (logits, l2-normalised spectral feature).

    ``dtype``: compute dtype for the conv/dense layers (params stay f32).
    bfloat16 hits the MXU's native precision; the feature normalisation
    and logits are promoted back to f32 so downstream loss math keeps the
    reference numerics.
    """

    num_features: int = 103
    dropout: float = 0.0
    num_classes: int = 9
    n_pc: int = 60
    dtype: Any = None

    @nn.compact
    def __call__(self, xp, x, *, train: bool = False):
        dt = self.dtype
        h = tconv(64, (1, 1), self.n_pc, name="conv0", dtype=dt)(xp)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv1", dtype=dt)(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv2", dtype=dt)(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        h = h.reshape(h.shape[0], -1)  # (B, 64 * (w/4)^2)

        y = tdense(FEAT_DIM, self.num_features, name="feat_spe",
                   dtype=dt)(x)
        y = nn.relu(y)

        z = jnp.concatenate([h, y], axis=1)
        feat = l2_normalize(y.astype(jnp.float32))
        if self.dropout > 0:
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
        logits = tdense(self.num_classes, z.shape[-1], name="classifier",
                        dtype=dt)(z)
        return logits.astype(jnp.float32), feat


class BaseNet1(nn.Module):
    """Simpler dual-branch net (conpared_models.py:192-247): 5-channel
    patches, 256-d joint feature head."""

    num_features: int = 103
    dropout: float = 0.0
    num_classes: int = 9
    n_pc: int = 5

    @nn.compact
    def __call__(self, xp, x, *, train: bool = False):
        h = tconv(64, (1, 1), self.n_pc, name="conv0")(xp)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv1")(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv2")(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        h = h.reshape(h.shape[0], -1)

        y = tdense(1024, self.num_features, name="feat_spe")(x)
        y = nn.relu(y)

        z = jnp.concatenate([h, y], axis=1)
        feat = tdense(256, z.shape[-1], name="feat_ss")(z)
        z = nn.relu(feat)
        if self.dropout > 0:
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
        logits = tdense(self.num_classes, 256, name="classifier")(z)
        return logits, feat


class Decoder(nn.Module):
    """Reconstructs the spectrum and the PCA patch from a 256-d code
    (models.py:289-320)."""

    num_features: int = 103
    n_pc: int = 60
    patch_size: int = 20

    @nn.compact
    def __call__(self, code):
        y = tdense(128, 256, name="recon_y1")(code)
        y_re = tdense(self.num_features, 128, name="recon_y2")(y)

        p = self.patch_size // 4  # 5 for w=20
        h = tdense(64 * p * p, 256, name="recon_x")(code)
        h = h.reshape(h.shape[0], p, p, 64)
        h = _upsample_nearest(h, 4)
        h = tconv(64, (3, 3), 64, padding=1, name="re_conv1")(h)
        h = _upsample_nearest(h, self.patch_size)
        h = tconv(64, (3, 3), 64, padding=1, name="re_conv2")(h)
        x_re = tconv(self.n_pc, (1, 1), 64, name="conv0")(h)
        return y_re, x_re


def _upsample_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """nn.Upsample(size) nearest-neighbour to (size, size), NHWC."""
    b, h, w, c = x.shape
    rows = (jnp.arange(size) * h) // size
    cols = (jnp.arange(size) * w) // size
    return x[:, rows][:, :, cols]


class CCTNet(nn.Module):
    """CCT encoder (models.py:229-287): BaseNet2 stem returning the 2624-d
    joint feature twice.  ``with_decoder`` reproduces the reference's
    compute-and-discard reconstruction (off by default — it wastes FLOPs;
    enable to recover the decoder capability).

    ``dtype``: compute dtype for the stem conv/dense layers (params stay
    f32); the joint feature is promoted back to f32 so the decoder heads
    and the JS-loss math keep reference numerics.
    """

    num_features: int = 103
    dropout: float = 0.0
    num_classes: int = 9
    n_pc: int = 60
    with_decoder: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, xp, x, *, train: bool = False):
        dt = self.dtype
        h = tconv(64, (1, 1), self.n_pc, name="conv0", dtype=dt)(xp)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv1", dtype=dt)(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        res = h
        h = tconv(64, (3, 3), 64, padding=1, name="conv2", dtype=dt)(h)
        h = nn.relu(h + res)
        h = avg_pool2(h)
        h = h.reshape(h.shape[0], -1)

        y = tdense(1024, self.num_features, name="feat_spe", dtype=dt)(x)
        y = nn.relu(y)

        fea1 = jnp.concatenate([h, y], axis=1).astype(jnp.float32)
        if self.with_decoder:
            fea = tdense(256, fea1.shape[-1], name="feat_ss")(fea1)
            recon = Decoder(self.num_features, self.n_pc, name="decoder")(fea)
            return fea1, fea1, recon
        return fea1, fea1


class LinearClassifier(nn.Module):
    """Linear head over the 2624-d joint feature (models.py:322-330)."""

    num_classes: int
    in_features: int = JOINT_DIM

    @nn.compact
    def __call__(self, x):
        return tdense(self.num_classes, self.in_features, name="fc")(x)
