"""DBDA — Double-Branch Dual-Attention network (reference
``tools/conpared_models.py:719-1077``).

The reference defines ``DBDA_network`` twice; the second definition shadows
the first.  Both are kept as capabilities:

- :class:`DBDAFeature` — first definition (:719-900): adds a 64-d
  l2-normalised feature head and returns ``(logits, feature)``.
- :class:`DBDA` — shadowing definition (:903-1077): plain logits head.

Layout: input patch (B, w, w, band) NHWC; internally NDHWC
(B, H, W, D=band, C) — the reference's NCDHW with the spectral axis as
conv depth.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from cmlpl_tpu.models.attention import CAMModule, PAMModule
from cmlpl_tpu.models.common import l2_normalize


def _bn_relu(x, train: bool, name: str):
    x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                     momentum=0.9, name=name)(x)
    return nn.relu(x)


class _DBDATrunk(nn.Module):
    """Shared spectral + spatial dense branches with CAM/PAM attention;
    returns the pooled 120-d concat."""

    band: int

    @nn.compact
    def __call__(self, xp, *, train: bool = False):
        b, w, _, band = xp.shape
        x00 = xp[:, :, :, :, None]  # (B, H, W, D=band, C=1)

        # ---- spectral branch: dense Conv3d (1,1,7) chain, growth 24 ----
        x11 = nn.Conv(24, (1, 1, 7), strides=(1, 1, 2), padding="VALID",
                      name="conv11")(x00)
        x12 = _bn_relu(x11, train, "bn11")
        x12 = nn.Conv(24, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)),
                      name="conv12")(x12)
        x13 = jnp.concatenate([x11, x12], axis=-1)
        x13 = _bn_relu(x13, train, "bn12")
        x13 = nn.Conv(24, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)),
                      name="conv13")(x13)
        x14 = jnp.concatenate([x11, x12, x13], axis=-1)
        x14 = _bn_relu(x14, train, "bn13")
        x14 = nn.Conv(24, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)),
                      name="conv14")(x14)
        x15 = jnp.concatenate([x11, x12, x13, x14], axis=-1)
        x16 = _bn_relu(x15, train, "bn14")
        kernel_3d = math.floor((self.band - 6) / 2)
        x16 = nn.Conv(60, (1, 1, kernel_3d), padding="VALID",
                      name="conv15")(x16)
        # spectral (channel) attention over the 60 channels
        x1 = CAMModule(60, name="attention_spectral")(x16) * x16

        # ---- spatial branch: dense Conv3d (3,3,1) chain ----
        x21 = nn.Conv(24, (1, 1, band), padding="VALID",
                      name="conv21")(x00)  # depth -> 1
        x22 = _bn_relu(x21, train, "bn21")
        x22 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)),
                      name="conv22")(x22)
        x23 = jnp.concatenate([x21, x22], axis=-1)
        x23 = _bn_relu(x23, train, "bn22")
        x23 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)),
                      name="conv23")(x23)
        x24 = jnp.concatenate([x21, x22, x23], axis=-1)
        x24 = _bn_relu(x24, train, "bn23")
        x24 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)),
                      name="conv24")(x24)
        x25 = jnp.concatenate([x21, x22, x23, x24], axis=-1)  # 60 ch, D=1
        # position (spatial) attention; PAM expects NHWC
        x25_2d = x25[:, :, :, 0, :]
        x2 = PAMModule(60, name="attention_spatial")(x25_2d)
        x2 = (x2 * x25_2d)[:, :, :, None, :]

        # global average pool over all spatial/depth dims
        p1 = jnp.mean(x1, axis=(1, 2, 3))
        p2 = jnp.mean(x2, axis=(1, 2, 3))
        return jnp.concatenate([p1, p2], axis=1)  # (B, 120)


class DBDAFeature(nn.Module):
    """First DBDA definition (conpared_models.py:719-900): 64-d l2 feature
    head + 64->64->32->classes MLP; returns (logits, feature)."""

    band: int
    num_classes: int

    @nn.compact
    def __call__(self, xp, *, train: bool = False):
        pooled = _DBDATrunk(self.band, name="trunk")(xp, train=train)
        feature = nn.Dense(64, name="feature_out")(pooled)
        feature = l2_normalize(feature)
        h = nn.Dense(64, name="fc1")(feature)
        h = nn.Dense(32, name="fc2")(h)
        logits = nn.Dense(self.num_classes, name="fc3")(h)
        return logits, feature


class DBDA(nn.Module):
    """Shadowing DBDA definition (conpared_models.py:903-1077): direct
    120->classes head."""

    band: int
    num_classes: int

    @nn.compact
    def __call__(self, xp, *, train: bool = False):
        pooled = _DBDATrunk(self.band, name="trunk")(xp, train=train)
        return nn.Dense(self.num_classes, name="full_connection")(pooled)
