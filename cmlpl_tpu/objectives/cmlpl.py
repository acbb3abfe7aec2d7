"""CMLPL objective terms (reference ``train.py:191-271``).

All terms are pure functions over logits/features/probs; gradient stops
mirror the reference's ``detach()`` structure so one fused backward over
both networks' parameters is exactly equivalent to the reference's two
independent ``backward()`` calls.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import nn as jnn


def adaptive_threshold(epoch: jnp.ndarray, num_epochs: int,
                       thr: float = 1.0) -> jnp.ndarray:
    """Confidence threshold decaying from ``thr`` over training
    (reference train.py:147-148, :221): thr * exp(-0.5 (epoch/E)^2)."""
    decay = epoch / num_epochs
    return thr * jnp.exp(-0.5 * decay * decay)


def soft_consistency(logits: jnp.ndarray, target_probs: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """Masked cross-network consistency (train.py:239-242):
    mean_i [ -sum_c log_softmax(logits)_ic * probs_ic * mask_i ].

    Note the mean divides by the batch size, not mask.sum() — matching the
    reference exactly.
    """
    logp = jnn.log_softmax(logits, axis=1)
    per_example = -jnp.sum(logp * target_probs, axis=1) * mask
    return jnp.mean(per_example)


def pseudo_label_graph(probs_row: jnp.ndarray, probs_col: jnp.ndarray,
                       pos_thresh: float = 0.8, neg_thresh: float = 0.3
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pseudo-label graph with self-loops (train.py:249-256).

    Q0 = probs_row @ probs_col.T with unit diagonal; positives are rows of
    Q0 >= pos_thresh (row-normalised), negatives weight (1 - Q0) where
    Q0 <= neg_thresh (row-normalised with +1e-8).
    Returns (Q, Q_n).  No gradients flow through this in the reference
    (probs come from a no_grad block); callers should pass stop_gradient'ed
    probs.
    """
    q0 = jnp.dot(probs_row, probs_col.T, preferred_element_type=jnp.float32)
    eye = jnp.eye(q0.shape[0], dtype=q0.dtype)
    q0 = q0 * (1.0 - eye) + eye  # fill_diagonal_(1), train.py:250

    pos = (q0 >= pos_thresh).astype(q0.dtype)
    q = q0 * pos
    q = q / jnp.sum(q, axis=1, keepdims=True)

    neg = (q0 <= neg_thresh).astype(q0.dtype)
    qn = (1.0 - q0) * neg
    qn = qn / (jnp.sum(qn, axis=1, keepdims=True) + 1e-8)
    return q, qn


def graph_contrastive(feats_row: jnp.ndarray, feats_col: jnp.ndarray,
                      q: jnp.ndarray, qn: jnp.ndarray,
                      temperature: float) -> jnp.ndarray:
    """Contrastive pseudo-label-graph loss for one network
    (train.py:246-265):

        sim   = rownorm(exp(feats_row @ feats_col.T / T))
        loss  = mean(-sum(log(sim) * Q, 1)) + mean(sum(log(sim + 1) * Q_n, 1))

    The sim matrix is always oriented rows = net-B features, cols = net-E
    features (matching Q's orientation).  The caller stop-gradients
    whichever side must not carry gradients: the reference detaches the
    E side for net B's loss (train.py:246) and the B side for net E's loss
    (train.py:257).
    """
    logits = jnp.dot(feats_row, feats_col.T,
                     preferred_element_type=jnp.float32) / temperature
    sim = jnp.exp(logits)
    sim_probs = sim / jnp.sum(sim, axis=1, keepdims=True)
    pos_term = -jnp.sum(jnp.log(sim_probs) * q, axis=1)
    neg_term = jnp.sum(jnp.log(sim_probs + 1.0) * qn, axis=1)
    return jnp.mean(pos_term) + jnp.mean(neg_term)
