"""Functional pseudo-label memory queue.

The reference keeps two FIFO queues of (1024-d features, class probs) per
network, written in place under ``torch.no_grad`` (``train.py:138-145``
allocation, ``:212-237`` smoothing + update).  Under jit that state becomes
an explicit carry: a :class:`QueueState` is threaded through the train step
and updated with a scatter.

Pointer semantics: the reference advances the pointer by the constant 256
instead of the written row count, and seeds ``queue_ptr1`` from the *already
updated* ``queue_ptr`` (``train.py:234-237``) — with default batch sizes
(n = 256) the first quirk is a no-op and the second only delays one queue
region's first overwrite.  We implement the *intended* semantics (advance by
n, independent pointers), which is identical for the default configuration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QueueState(NamedTuple):
    feats: jax.Array  # (size, feat_dim) float32
    probs: jax.Array  # (size, num_classes) float32
    ptr: jax.Array    # () int32


def queue_init(size: int, feat_dim: int, num_classes: int,
               dtype=jnp.float32) -> QueueState:
    """Zero-initialised queue (reference train.py:139-144)."""
    return QueueState(
        feats=jnp.zeros((size, feat_dim), dtype),
        probs=jnp.zeros((size, num_classes), dtype),
        ptr=jnp.zeros((), jnp.int32),
    )


def memory_smooth(feats: jax.Array, probs: jax.Array, queue: QueueState,
                  alpha: float, temperature: float) -> jax.Array:
    """Pseudo-label memory smoothing (reference train.py:213-219):

        A = rownorm(exp(feats @ queue_feats.T / T))   [== softmax]
        probs <- alpha * probs + (1 - alpha) * A @ queue_probs
    """
    logits = jnp.dot(feats, queue.feats.T,
                     preferred_element_type=jnp.float32) / temperature
    A = jax.nn.softmax(logits, axis=1)
    smoothed = alpha * probs + (1.0 - alpha) * jnp.dot(
        A, queue.probs, preferred_element_type=jnp.float32)
    return smoothed


def queue_update(queue: QueueState, new_feats: jax.Array,
                 new_probs: jax.Array) -> QueueState:
    """FIFO write of n rows at the pointer, modulo the queue size."""
    n = new_feats.shape[0]
    size = queue.feats.shape[0]
    idx = (queue.ptr + jnp.arange(n, dtype=jnp.int32)) % size
    return QueueState(
        feats=queue.feats.at[idx].set(new_feats.astype(queue.feats.dtype)),
        probs=queue.probs.at[idx].set(new_probs.astype(queue.probs.dtype)),
        ptr=(queue.ptr + n) % size,
    )
