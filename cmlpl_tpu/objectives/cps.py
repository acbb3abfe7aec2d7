"""Cross Pseudo Supervision objective (reference ``trian_CPS.py:238-249``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from cmlpl_tpu.objectives.supervised import cross_entropy


def cps_cross_supervision(logits_a: jnp.ndarray,
                          logits_b: jnp.ndarray) -> jnp.ndarray:
    """CE of ``logits_a`` against the argmax pseudo-labels of ``logits_b``
    (detached), the CPS cross-supervision term (trian_CPS.py:238-242)."""
    pseudo = jnp.argmax(lax.stop_gradient(logits_b), axis=1)
    return cross_entropy(logits_a, pseudo)
