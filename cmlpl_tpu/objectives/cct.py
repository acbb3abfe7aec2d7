"""CCT consistency objective (reference ``trian_CCT.py:76-84``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, nn as jnn


def softmax_js_loss(logits: jnp.ndarray, target_probs: jnp.ndarray,
                    epsilon: float = 1e-5) -> jnp.ndarray:
    """Symmetric JS-style consistency between a softmax over ``logits`` and
    fixed ``target_probs`` (trian_CCT.py:76-84):

        M   = (softmax(logits) + targets) / 2
        kl1 = KL-div(log_softmax(logits), M)   [torch 'mean' reduction]
        kl2 = KL-div(log(targets + eps), M)
        loss = (kl1 + kl2) / 2

    torch's ``F.kl_div(input, target, reduction='mean')`` computes
    mean over *all elements* of target * (log target - input); replicated
    exactly (including its elementwise mean, which divides by B * C).
    """
    target_probs = lax.stop_gradient(target_probs)
    m = (jnn.softmax(logits, axis=1) + target_probs) * 0.5

    def kl_div_mean(log_input, target):
        # torch F.kl_div with reduction='mean': mean over elements of
        # target * (log(target) - log_input), with 0 log 0 := 0
        t_log_t = jnp.where(target > 0, target * jnp.log(target), 0.0)
        return jnp.mean(t_log_t - target * log_input)

    kl1 = kl_div_mean(jnn.log_softmax(logits, axis=1), m)
    kl2 = kl_div_mean(jnp.log(target_probs + epsilon), m)
    return (kl1 + kl2) * 0.5
