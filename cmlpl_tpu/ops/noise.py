"""Gaussian input-view generation for the semi-supervised trainers.

The reference perturbs every training input with iid Gaussian noise
(train.py:157-184 / trian_CPS.py / trian_CCT.py:179-197 draw a fresh
``torch.randn`` per tensor).  All three rebuilt trainers draw the same
views on device; this module owns the two opt-in perf knobs around that
draw (both change the realised random STREAM, like ``rng_impl``, so they
are default-off until the OA study clears them — docs/BENCHMARKS.md
"noise-view study"):

- ``noise_impl="binom16"``: sample the standardised Binomial(16, 1/2)
  instead of a true normal — ``(popcount(16 random bits) - 8) / 2`` has
  mean 0 / variance 1 and needs no erfinv, trading the transcendental
  for one population_count.  The distribution is a 17-level lattice
  within ±4 sigma; for input augmentation noise the moments are what
  matter, which the OA study verifies.
- ``noise_fused=True``: draw each net's labeled+unlabeled view with ONE
  key over the concatenated tensor (4 draws instead of 8 for the
  two-net trainers).  Element distribution and cross-view independence
  are identical to the reference structure — only the key-split tree
  changes — but the generated HLO has half the RNG kernels for XLA to
  schedule/fuse.

Why there is no "per-epoch pre-noised pool" knob: each unlabeled sample
is visited ~once per epoch (9,984 draws over 10,000 uniques at the
reference schedule), so pre-generating pool noise performs the SAME
number of normal draws as the per-step path while adding ~0.5 GB HBM
and freezing the labeled samples' augmentation across their ~220
visits/epoch.  Measured-analysis dead-end, recorded in
docs/BENCHMARKS.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def make_noiser(noise_impl: str, scale: float):
    """Returns ``noisy(key, a) -> a + scale * sample(a.shape)``.

    Samples in ``a.dtype`` (bf16 under the fast stack's
    ``input_dtype="compute"``, halving RNG bit generation).
    """
    if noise_impl == "normal":
        def sample(k, shape, dtype):
            return jax.random.normal(k, shape, dtype)
    elif noise_impl == "binom16":
        def sample(k, shape, dtype):
            bits = jax.random.bits(k, shape, dtype=jnp.uint16)
            pc = lax.population_count(bits)
            return (pc.astype(dtype) - jnp.asarray(8, dtype)) * \
                jnp.asarray(0.5, dtype)
    else:
        raise ValueError(f"unknown noise_impl {noise_impl!r} "
                         "(want 'normal' or 'binom16')")

    def noisy(k, a):
        return a + sample(k, a.shape, a.dtype) * jnp.asarray(scale, a.dtype)

    return noisy


def two_net_views(noisy, fused: bool, k_noise, xp_l, x_l, xp_u, x_u):
    """The two-net trainers' 4 input views (net B patches/spectra, net E
    patches/spectra), each the labeled||unlabeled concatenation with an
    independent noise draw per element (train.py:157-184's 8
    ``torch.randn`` calls).

    ``fused=False`` reproduces the reference's draw structure (8 keys,
    noise before concatenation); ``fused=True`` draws once per view over
    the concatenated tensor (4 keys).
    """
    cat = lambda a, b: jnp.concatenate([a, b], axis=0)  # noqa: E731
    if fused:
        nk = jax.random.split(k_noise, 4)
        return (noisy(nk[0], cat(xp_l, xp_u)),
                noisy(nk[1], cat(x_l, x_u)),
                noisy(nk[2], cat(xp_l, xp_u)),
                noisy(nk[3], cat(x_l, x_u)))
    nk = jax.random.split(k_noise, 8)
    return (cat(noisy(nk[0], xp_l), noisy(nk[1], xp_u)),
            cat(noisy(nk[2], x_l), noisy(nk[3], x_u)),
            cat(noisy(nk[4], xp_l), noisy(nk[5], xp_u)),
            cat(noisy(nk[6], x_l), noisy(nk[7], x_u)))
