"""Parameter initializers matching torch defaults.

The reference uses stock ``nn.Conv2d`` / ``nn.Linear`` initialisation
(kaiming_uniform with a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
weights, and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for biases).  OA parity
(BASELINE.md) is measured statistically across seeds, so matching the init
*distribution* is what matters — these initializers reproduce it exactly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# torch's default weight init, kaiming_uniform_(a=sqrt(5)):
#   gain = sqrt(2 / (1 + a^2)) = sqrt(1/3);  bound = gain * sqrt(3/fan_in)
#        = 1/sqrt(fan_in)
# jax variance_scaling(scale, 'fan_in', 'uniform') draws
#   U(-sqrt(3*scale/fan_in), sqrt(3*scale/fan_in)),
# so scale = 1/3 gives bound = 1/sqrt(fan_in).
torch_linear_kernel_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")
torch_conv_kernel_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_normal_init():
    """torch ``init.kaiming_normal_`` (fan_in, relu gain), as used by the
    reference's ``_weights_init`` for Linear/Conv3d (models.py:42-46)."""
    return jax.nn.initializers.variance_scaling(2.0, "fan_in", "normal")
