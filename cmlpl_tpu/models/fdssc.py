"""FDSSC — Fast Dense Spectral-Spatial Convolution network (reference
``tools/conpared_models.py:1165-1290``).

Two dense Conv3d blocks (spectral (1,1,7) chain, then spatial after the
channel/depth permute), BN+PReLU, global pool, Dropout(0.5) + linear head.
Layout: (B, H, W, D, C) NDHWC.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def _bn_prelu(x, train: bool, name: str):
    x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                     momentum=0.9, name=f"{name}_bn")(x)
    return nn.PReLU(name=f"{name}_prelu")(x)


class FDSSC(nn.Module):
    band: int
    num_classes: int

    @nn.compact
    def __call__(self, xp, *, train: bool = False):
        x = xp[:, :, :, :, None]  # (B, H, W, D=band, 1)
        pad_spec = ((0, 0), (0, 0), (3, 3))

        # ---- dense spectral block ----
        x1 = nn.Conv(24, (1, 1, 7), strides=(1, 1, 2), padding="VALID",
                     name="conv1")(x)
        x2 = _bn_prelu(x1, train, "b1")
        x2 = nn.Conv(12, (1, 1, 7), padding=pad_spec, name="conv2")(x2)
        x3 = jnp.concatenate([x1, x2], axis=-1)
        x3 = _bn_prelu(x3, train, "b2")
        x3 = nn.Conv(12, (1, 1, 7), padding=pad_spec, name="conv3")(x3)
        x4 = jnp.concatenate([x1, x2, x3], axis=-1)
        x4 = _bn_prelu(x4, train, "b3")
        x4 = nn.Conv(12, (1, 1, 7), padding=pad_spec, name="conv4")(x4)
        x5 = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # 60 channels

        x6 = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                          momentum=0.9, name="b4_bn")(x5)
        x6 = nn.relu(x6)
        kernel_3d = math.ceil((self.band - 6) / 2)
        x6 = nn.Conv(200, (1, 1, kernel_3d), padding="VALID",
                     name="conv5")(x6)
        # permute (0,4,2,3,1): 200 channels become the depth axis
        x6 = x6.transpose(0, 1, 2, 4, 3)  # (B, H, W, 200, Dold=1)

        # ---- dense spatial block ----
        x7 = _bn_prelu(x6, train, "b5")
        x7 = nn.Conv(24, (1, 1, 200), padding="VALID", name="conv6")(x7)
        x8 = _bn_prelu(x7, train, "b6")
        x8 = nn.Conv(12, (1, 1, 7), padding=pad_spec, name="conv7")(x8)
        x9 = jnp.concatenate([x7, x8], axis=-1)
        x9 = _bn_prelu(x9, train, "b7")
        x9 = nn.Conv(12, (1, 1, 7), padding=pad_spec, name="conv8")(x9)
        x10 = jnp.concatenate([x7, x8, x9], axis=-1)
        x10 = _bn_prelu(x10, train, "b8")
        x10 = nn.Conv(12, (1, 1, 7), padding=pad_spec, name="conv9")(x10)
        x10 = jnp.concatenate([x7, x8, x9, x10], axis=-1)  # 60 channels
        x10 = _bn_prelu(x10, train, "b9")

        pooled = jnp.mean(x10, axis=(1, 2, 3))  # global avg pool -> 60
        pooled = nn.Dropout(0.5, deterministic=not train)(pooled)
        return nn.Dense(self.num_classes, name="head")(pooled)
