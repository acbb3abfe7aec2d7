"""Distribution-matching losses.

The reference imports ``Distribution_Loss(loss='mmd')`` from a module
``regularizer`` that does not exist in the repo (``trian_CPS.py:11,163`` —
the scripts crash at import as shipped).  The rebuild supplies the missing
capability: a multi-kernel (RBF) MMD plus the usual distance menu.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn


def _pairwise_sq_dists(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)
    return x2 + y2.T - 2.0 * jnp.dot(x, y.T,
                                     preferred_element_type=jnp.float32)


def mmd_loss(x: jnp.ndarray, y: jnp.ndarray, num_kernels: int = 5,
             kernel_mul: float = 2.0) -> jnp.ndarray:
    """Multi-kernel RBF maximum mean discrepancy between sample sets."""
    n = x.shape[0]
    z = jnp.concatenate([x, y], axis=0)
    d2 = _pairwise_sq_dists(z, z)
    # median-free bandwidth heuristic: mean of off-diagonal distances
    m = z.shape[0]
    bandwidth = jnp.sum(d2) / (m * m - m)
    bandwidth = bandwidth / (kernel_mul ** (num_kernels // 2))
    kernels = sum(
        jnp.exp(-d2 / (bandwidth * (kernel_mul ** i) + 1e-12))
        for i in range(num_kernels))
    kxx = kernels[:n, :n]
    kyy = kernels[n:, n:]
    kxy = kernels[:n, n:]
    return jnp.mean(kxx) + jnp.mean(kyy) - 2.0 * jnp.mean(kxy)


def distribution_loss(x: jnp.ndarray, y: jnp.ndarray,
                      loss: str = "mmd") -> jnp.ndarray:
    """The ``Distribution_Loss`` menu: mmd / mse / kl / cosine."""
    if loss == "mmd":
        return mmd_loss(x, y)
    if loss == "mse":
        return jnp.mean(jnp.square(x - y))
    if loss == "kl":
        px = jnn.log_softmax(x, axis=1)
        py = jnn.softmax(y, axis=1)
        return jnp.mean(jnp.sum(py * (jnp.log(py + 1e-10) - px), axis=1))
    if loss == "cosine":
        xn = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-8)
        yn = y / (jnp.linalg.norm(y, axis=1, keepdims=True) + 1e-8)
        return jnp.mean(1.0 - jnp.sum(xn * yn, axis=1))
    raise ValueError(f"unknown distribution loss {loss!r}")
