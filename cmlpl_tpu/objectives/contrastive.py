"""Contrastive objectives: NT-Xent and the U2PL-style memory-bank loss.

- :func:`nt_xent` reproduces the reference's ``ContrastiveLoss``
  (tools/models.py:14-39, SimCLR NT-Xent over a 2B cosine-sim matrix) —
  constructed but never used by the reference scripts; kept as an available
  objective.
- :func:`memobank_contrastive` re-derives ``compute_contra_memobank_loss``
  (loss_helper.py:39-219) for the pixel-vector domain as a jit-compatible
  pure function over a fixed-size per-class memory bank.  The reference
  version is imported by the CPS/CCT scripts but never called; it is carried
  here as an optional objective.  Dynamic-shape constructs (boolean-mask
  feature lists, Python-side queues) become masked fixed-size sampling and a
  :class:`MemoBankState` carry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, nn as jnn

from cmlpl_tpu.models.common import l2_normalize


def nt_xent(emb_i: jnp.ndarray, emb_j: jnp.ndarray,
            temperature: float = 0.5) -> jnp.ndarray:
    """SimCLR NT-Xent (models.py:14-39)."""
    b = emb_i.shape[0]
    z = jnp.concatenate([l2_normalize(emb_i), l2_normalize(emb_j)], axis=0)
    sim = jnp.dot(z, z.T, preferred_element_type=jnp.float32)  # cosine: rows unit
    pos = jnp.concatenate([jnp.diagonal(sim, offset=b),
                           jnp.diagonal(sim, offset=-b)])
    num = jnp.exp(pos / temperature)
    mask = 1.0 - jnp.eye(2 * b, dtype=sim.dtype)
    den = jnp.sum(mask * jnp.exp(sim / temperature), axis=1)
    return jnp.sum(-jnp.log(num / den)) / (2 * b)


class MemoBankState(NamedTuple):
    """Per-class FIFO of negative features (replaces the host-side Python
    queues of loss_helper.py:19-36)."""

    feats: jax.Array   # (num_classes, size, feat_dim)
    count: jax.Array   # (num_classes,) rows ever written (saturates at size)
    ptr: jax.Array     # (num_classes,) write pointer


def memobank_init(num_classes: int, size: int, feat_dim: int,
                  dtype=jnp.float32) -> MemoBankState:
    return MemoBankState(
        feats=jnp.zeros((num_classes, size, feat_dim), dtype),
        count=jnp.zeros((num_classes,), jnp.int32),
        ptr=jnp.zeros((num_classes,), jnp.int32),
    )


def _masked_choice(key, mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sample ``n`` indices (with replacement) from positions where mask is
    true; if the mask is empty, indices are arbitrary (caller gates on
    mask.sum())."""
    logits = jnp.where(mask, 0.0, -1e30)
    return jax.random.categorical(key, logits, shape=(n,))


def memobank_update(bank: MemoBankState, feats: jnp.ndarray,
                    class_mask: jnp.ndarray, max_push: int,
                    key: jax.Array) -> MemoBankState:
    """Push up to ``max_push`` negative candidates per class into the bank.

    ``class_mask`` is (num_classes, N) boolean: candidate negatives for each
    class (the reference's high-entropy + rank-window mask,
    loss_helper.py:109-126).  Fixed-size sampling keeps shapes static.
    """
    num_classes, size = bank.feats.shape[0], bank.feats.shape[1]

    def push_one(carry_bank, inputs):
        c, k = inputs
        mask = class_mask[c]
        n_cand = jnp.sum(mask)
        idx = _masked_choice(k, mask, max_push)
        rows = feats[idx]
        n_push = jnp.minimum(n_cand, max_push).astype(jnp.int32)
        write_pos = (carry_bank.ptr[c]
                     + jnp.arange(max_push, dtype=jnp.int32)) % size
        # only the first n_push rows are real; keep old rows elsewhere
        valid = jnp.arange(max_push) < n_push
        old = carry_bank.feats[c, write_pos]
        new_rows = jnp.where(valid[:, None], rows, old)
        feats_c = carry_bank.feats.at[c, write_pos].set(new_rows)
        return MemoBankState(
            feats=feats_c,
            count=carry_bank.count.at[c].add(n_push),
            ptr=carry_bank.ptr.at[c].set(
                (carry_bank.ptr[c] + n_push) % size),
        ), None

    keys = jax.random.split(key, num_classes)
    cls_ids = jnp.arange(num_classes, dtype=jnp.int32)
    bank, _ = lax.scan(push_one, bank, (cls_ids, keys))
    return bank


def memobank_contrastive(
        rep: jnp.ndarray,             # (N, D) student features
        rep_teacher: jnp.ndarray,     # (N, D) teacher features (no grad)
        probs: jnp.ndarray,           # (N, C) teacher probabilities
        labels: jnp.ndarray,          # (N,) pseudo/ground-truth class ids
        low_entropy_mask: jnp.ndarray,   # (N,) anchor candidates
        high_entropy_mask: jnp.ndarray,  # (N,) negative candidates
        bank: MemoBankState,
        key: jax.Array,
        *,
        num_queries: int = 256,
        num_negatives: int = 50,
        temperature: float = 0.5,
        delta_p: float = 0.3,
        low_rank: int = 3,
        high_rank: int = 9,
        max_push: int = 64,
        momentum_prototypes: jnp.ndarray | None = None,
        i_iter: int | jnp.ndarray = 0,
):
    """InfoNCE against class prototypes with memory-bank negatives
    (loss_helper.py:39-219, pixel-vector domain).

    Per class c: anchors = low-entropy pixels of class c with
    prob_c > delta_p; positive = mean teacher feature of class c's
    low-entropy pixels; negatives = bank samples for class c, refreshed from
    high-entropy pixels whose class-c probability ranks in
    [low_rank, high_rank).  Classes with no anchors or empty banks
    contribute zero.

    ``momentum_prototypes`` (C, D): the reference's optional EMA
    prototypes (loss_helper.py:193-202) — positives are blended with the
    running prototype at decay min(1 - 1/i_iter, 0.999) once the running
    state is non-zero, and the updated (C, D) prototypes are returned as
    a third output.
    """
    rep_teacher = lax.stop_gradient(rep_teacher)
    probs = lax.stop_gradient(probs)
    n, d = rep.shape
    num_classes = probs.shape[1]

    onehot = jnn.one_hot(labels, num_classes, dtype=jnp.float32)  # (N, C)
    low_valid = onehot * low_entropy_mask[:, None]   # (N, C)

    # rank of each class per pixel by descending probability
    order = jnp.argsort(-probs, axis=1)                    # (N, C)
    ranks = jnp.argsort(order, axis=1)                     # rank of class c
    in_rank_window = (ranks >= low_rank) & (ranks < high_rank)

    anchor_mask = (probs > delta_p) & (low_valid > 0).astype(bool)  # (N, C)
    # negatives for class c: high-entropy pixels NOT labeled c whose
    # class-c probability ranks in [low_rank, high_rank) — "plausible but
    # wrong" classes.  (The reference's own mask, loss_helper.py:96-126,
    # ANDs `label == c` with `rank(c) in [3,9)`; with argmax pseudo-labels
    # the labeled class always ranks 0, so that conjunction is
    # structurally empty — dead code faithfully diverged from.)
    negative_mask = ((onehot == 0) & high_entropy_mask[:, None]
                     & in_rank_window)

    # class prototypes: mean teacher feature over low-valid pixels
    weights = low_valid / jnp.maximum(
        jnp.sum(low_valid, axis=0, keepdims=True), 1.0)    # (N, C)
    protos = jnp.einsum("nc,nd->cd", weights, rep_teacher)  # (C, D)

    new_prototypes = None
    if momentum_prototypes is not None:
        # EMA blend (loss_helper.py:193-202): active once the running
        # prototypes are non-zero
        warm = jnp.any(momentum_prototypes != 0)
        decay = jnp.minimum(1.0 - 1.0 / jnp.maximum(i_iter, 1), 0.999)
        blended = ((1.0 - decay) * protos + decay * momentum_prototypes)
        protos = jnp.where(warm, blended, protos)
        new_prototypes = protos

    # refresh the bank with negatives, then sample from it
    bank = memobank_update(bank, rep_teacher, negative_mask.T, max_push, key)

    k_anchor, k_neg = jax.random.split(jax.random.fold_in(key, 1))

    def per_class(c, keys):
        ka, kn = keys
        a_mask = anchor_mask[:, c]
        has_anchor = jnp.sum(a_mask) > 0
        has_neg = bank.count[c] > 0
        a_idx = _masked_choice(ka, a_mask, num_queries)
        anchors = rep[a_idx]                                # (Q, D) grads!
        size = bank.feats.shape[1]
        valid_rows = jnp.minimum(bank.count[c], size)
        n_idx = jax.random.randint(
            kn, (num_queries * num_negatives,), 0,
            jnp.maximum(valid_rows, 1))
        negs = bank.feats[c][n_idx].reshape(
            num_queries, num_negatives, d)
        pos = jnp.broadcast_to(protos[c][None, None, :],
                               (num_queries, 1, d))
        all_feat = jnp.concatenate([pos, negs], axis=1)     # (Q, 1+K, D)
        logits = jnp.einsum(
            "qd,qkd->qk", l2_normalize(anchors, eps=1e-12),
            l2_normalize(all_feat, axis=-1, eps=1e-12)) / temperature
        loss_c = jnp.mean(-jnn.log_softmax(logits, axis=1)[:, 0])
        return jnp.where(has_anchor & has_neg, loss_c, 0.0), \
            (has_anchor & has_neg).astype(jnp.float32)

    keys = jax.random.split(k_anchor, num_classes), \
        jax.random.split(k_neg, num_classes)
    losses, valids = jax.vmap(per_class)(
        jnp.arange(num_classes), (keys[0], keys[1]))
    valid_seg = jnp.maximum(jnp.sum(valids), 1.0)
    loss = jnp.sum(losses) / valid_seg
    if new_prototypes is not None:
        return loss, bank, new_prototypes
    return loss, bank
