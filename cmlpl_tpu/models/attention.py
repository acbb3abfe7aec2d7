"""Position and channel attention modules (reference
``tools/conpared_models.py:620-707``).

Layout note: the reference squeezes/reshapes 5-D torch NCDHW tensors; here
PAM takes NHWC and CAM takes (B, ..., C) with channels last, matching the
rest of the framework.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cmlpl_tpu.models.common import tconv


class PAMModule(nn.Module):
    """Position (spatial) attention, SAGAN-style
    (conpared_models.py:620-672): 1x1 conv q/k/v, softmax over HW affinity,
    gamma-gated residual."""

    in_dim: int

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        q = tconv(max(c // 8, 1), (1, 1), c, name="query_conv")(x)
        k = tconv(max(c // 8, 1), (1, 1), c, name="key_conv")(x)
        v = tconv(c, (1, 1), c, name="value_conv")(x)
        q = q.reshape(b, h * w, -1)
        k = k.reshape(b, h * w, -1)
        v = v.reshape(b, h * w, c)
        energy = jnp.einsum("bnd,bmd->bnm", q, k)      # (B, HW, HW)
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class CAMModule(nn.Module):
    """Channel attention (conpared_models.py:675-707): gram matrix over
    channels with the max-energy trick, gamma-gated residual."""

    in_dim: int

    @nn.compact
    def __call__(self, x):  # x: (B, ..., C), channels last
        b = x.shape[0]
        c = x.shape[-1]
        flat = x.reshape(b, -1, c)                      # (B, N, C)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat)  # (B, C, C)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(x.shape)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x
