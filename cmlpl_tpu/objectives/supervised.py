"""Supervised / robust classification losses.

- :func:`cross_entropy` — mean CE over int labels (torch
  ``nn.CrossEntropyLoss`` semantics, reference train.py:129).
- :func:`reverse_cross_entropy` — RCE with clamped one-hot targets
  (loss_helper.py:222-239), re-derived for pixel-vector logits (the
  reference version is segmentation-shaped).
- :func:`entropy_filtered_ce` — U2PL-style unsupervised CE that drops the
  highest-entropy fraction of pixels (loss_helper.py:242-261), using a
  jit-compatible quantile instead of np.percentile.
- :func:`ohem_cross_entropy` — online hard example mining CE
  (loss_helper.py:477-557), vector-domain: keep examples whose true-class
  prob is below a threshold, with a min-kept floor.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, nn as jnn

IGNORE = -1  # ignored-label marker (the reference uses 255 for Cityscapes)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore: int = IGNORE) -> jnp.ndarray:
    """Mean softmax cross-entropy; entries with ``labels == ignore`` are
    excluded from the mean (torch ``ignore_index`` semantics)."""
    valid = (labels != ignore)
    safe = jnp.where(valid, labels, 0)
    logp = jnn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def reverse_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          num_classes: int, ignore: int = IGNORE,
                          clamp_min: float = 1e-4) -> jnp.ndarray:
    """RCE = -sum_c p_c log(clamp(onehot_c)) averaged over valid examples."""
    valid = (labels != ignore)
    safe = jnp.where(valid, labels, 0)
    onehot = jnn.one_hot(safe, num_classes)
    onehot = jnp.clip(onehot, clamp_min, 1.0)
    probs = jnn.softmax(logits, axis=-1)
    rce = -jnp.sum(probs * jnp.log(onehot), axis=-1) * valid
    return jnp.sum(rce) / jnp.maximum(jnp.sum(valid), 1)


def entropy_filtered_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                        teacher_logits: jnp.ndarray, percent: float,
                        ignore: int = IGNORE) -> jnp.ndarray:
    """Drop the top-``percent`` highest-entropy examples (per the teacher),
    then weighted CE over the survivors (loss_helper.py:242-261).

    weight = batch_size / num_kept, as in the reference.
    """
    probs = jnn.softmax(lax.stop_gradient(teacher_logits), axis=-1)
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-10), axis=-1)
    valid = (labels != ignore)
    # sort-based quantile over the valid entries only (np.percentile with
    # linear interpolation, computed jit-compatibly: invalid entries sort
    # to +inf past the valid prefix)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    order = jnp.sort(jnp.where(valid, entropy, jnp.inf))
    k = jnp.clip((percent / 100.0) * (n_valid - 1), 0, order.shape[0] - 1)
    lo = jnp.floor(k).astype(jnp.int32)
    hi = jnp.ceil(k).astype(jnp.int32)
    thresh = order[lo] + (order[hi] - order[lo]) * (k - lo)

    drop = (entropy >= thresh) & valid
    keep = valid & ~drop
    labels_kept = jnp.where(keep, labels, ignore)
    weight = labels.shape[0] / jnp.maximum(jnp.sum(keep), 1)
    return weight * cross_entropy(logits, labels_kept, ignore)


def ohem_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                       thresh: float = 0.7, min_kept: int = 256,
                       ignore: int = IGNORE) -> jnp.ndarray:
    """OHEM CE (loss_helper.py:477-557, vector domain): keep examples whose
    predicted true-class probability <= max(thresh, prob of the min_kept-th
    hardest example); mean CE over the kept set."""
    valid = (labels != ignore)
    safe = jnp.where(valid, labels, 0)
    probs = jnn.softmax(lax.stop_gradient(logits), axis=-1)
    true_prob = jnp.take_along_axis(probs, safe[:, None], axis=-1)[:, 0]
    true_prob = jnp.where(valid, true_prob, 1.0)  # masked_fill_(~valid, 1)

    order = jnp.sort(true_prob)
    k = jnp.minimum(min_kept, logits.shape[0]) - 1
    kth = order[jnp.maximum(k, 0)]
    threshold = jnp.maximum(kth, thresh)
    keep = (true_prob <= threshold) & valid
    labels_kept = jnp.where(keep, labels, ignore)
    return cross_entropy(logits, labels_kept, ignore)
