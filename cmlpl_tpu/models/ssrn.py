"""SSRN — Spectral-Spatial Residual Network (reference
``tools/conpared_models.py:1086-1163``).

Conv3d stem over the spectral axis, two spectral residual blocks, a
spectral-collapse conv whose 128 output channels become the depth axis for
the spatial stage, two spatial residual blocks, pooled linear head.
Layout: (B, H, W, D, C) NDHWC.
"""

from __future__ import annotations

import math

import flax.linen as nn


class Residual3D(nn.Module):
    """3-D residual block (conpared_models.py:1086-1108).

    The reference's ``conv1`` is ``Sequential(Conv3d, ReLU)`` and the
    forward applies ``F.relu(bn1(conv1(X)))`` — so the first conv is
    followed by ReLU, BN, and a SECOND ReLU (invisible at init, where BN
    is the identity on a non-negative input, but real after training;
    pinned by tests/test_zoo_torch_parity.py with randomised BN stats)."""

    out_channels: int
    kernel: tuple
    padding: tuple
    use_1x1conv: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = tuple((p, p) for p in self.padding)
        y = nn.Conv(self.out_channels, self.kernel, padding=pad,
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, self.kernel, padding=pad,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if self.use_1x1conv:
            x = nn.Conv(self.out_channels, (1, 1, 1), name="conv3")(x)
        return nn.relu(y + x)


class SSRN(nn.Module):
    band: int
    num_classes: int

    @nn.compact
    def __call__(self, xp, *, train: bool = False):
        # xp: (B, w, w, band) -> (B, H, W, D=band, C=1)
        x = xp[:, :, :, :, None]
        x = nn.Conv(24, (1, 1, 7), strides=(1, 1, 2), padding="VALID",
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                         momentum=0.9, name="bn1")(x)
        x = nn.relu(x)
        x = Residual3D(24, (1, 1, 7), (0, 0, 3), name="res1")(x, train=train)
        x = Residual3D(24, (1, 1, 7), (0, 0, 3), name="res2")(x, train=train)

        kernel_3d = math.ceil((self.band - 6) / 2)
        x = nn.Conv(128, (1, 1, kernel_3d), padding="VALID",
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                         momentum=0.9, name="bn2")(x)
        x = nn.relu(x)
        # torch permute(0,4,2,3,1): the 128 channels become the depth axis
        # and the remaining depth (1 after valid conv) becomes channels
        x = x.transpose(0, 1, 2, 4, 3)  # (B, H, W, 128, Dold)
        x = nn.Conv(24, (3, 3, 128), padding="VALID", name="conv3")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                         momentum=0.9, name="bn3")(x)
        x = nn.relu(x)
        x = Residual3D(24, (3, 3, 1), (1, 1, 0), name="res3")(x, train=train)
        x = Residual3D(24, (3, 3, 1), (1, 1, 0), name="res4")(x, train=train)
        # AvgPool3d((5,5,1)), floor mode
        x = nn.avg_pool(x, (5, 5, 1), strides=(5, 5, 1))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="head")(x)
