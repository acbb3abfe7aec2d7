"""Shared model building blocks.

``tconv`` / ``tdense`` are thin factories for flax Conv/Dense with torch's
default init distributions (see :mod:`cmlpl_tpu.core.init`) so the rebuild's
training dynamics are statistically comparable to the reference.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from cmlpl_tpu.core.init import (
    torch_bias_init,
    torch_conv_kernel_init,
    torch_linear_kernel_init,
)


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 0.0) -> jnp.ndarray:
    """L2 normalisation over ``axis`` — the reference's ``Normalize(2)``
    (tools/models.py:81-90), no epsilon (matches ``x / ||x||``)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    if eps:
        norm = jnp.maximum(norm, eps)
    return x / norm


def tconv(features: int, kernel: tuple[int, int], in_features: int,
          padding=0, strides=1, name=None, use_bias: bool = True,
          dtype=None) -> nn.Conv:
    """NHWC Conv2d with torch-default init (needs ``in_features`` to size
    the bias bound, since flax bias_init doesn't see fan_in).

    ``dtype`` is the compute dtype (e.g. jnp.bfloat16 to hit the MXU's
    native precision); params stay float32.
    """
    fan_in = in_features * int(np.prod(kernel))
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if isinstance(strides, int):
        strides = (strides, strides)
    return nn.Conv(
        features=features, kernel_size=kernel, strides=strides,
        padding=padding, use_bias=use_bias, dtype=dtype,
        kernel_init=torch_conv_kernel_init,
        bias_init=torch_bias_init(fan_in), name=name)


def tdense(features: int, in_features: int, name=None,
           use_bias: bool = True, dtype=None) -> nn.Dense:
    """Dense with torch-default init; ``dtype`` = compute dtype."""
    return nn.Dense(
        features=features, use_bias=use_bias, dtype=dtype,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_bias_init(in_features), name=name)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(kernel=2, stride=2), floor mode (torch default)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))
