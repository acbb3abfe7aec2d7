"""Config-dict criterion factory (reference ``loss_helper.py:264-346``).

The reference carries a YAML-ish ``get_criterion(cfg)`` from U2PL (never
exercised by its scripts).  Re-derived here for the pixel-vector domain:
plain CE, class-weighted CE, and OHEM CE, selected by the same cfg shape:

    cfg = {"criterion": {"type": "ohem", "kwargs": {...}},
           "dataset": {"ignore_label": -1},
           "net": {"aux_loss": {"loss_weight": 0.4}}}   # optional
"""

from __future__ import annotations

import functools
from typing import Callable

import jax.numpy as jnp
from jax import nn as jnn

from cmlpl_tpu.objectives.supervised import cross_entropy, ohem_cross_entropy


def weighted_cross_entropy(logits, labels, weights, ignore: int = -1):
    """CE with per-class weights (torch semantics: weighted mean —
    the denominator is the sum of the selected classes' weights)."""
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0)
    logp = jnn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    w = jnp.asarray(weights)[safe] * valid
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def get_criterion(cfg: dict) -> Callable:
    """Build ``loss(preds, target)`` from the reference's cfg-dict shape.

    ``preds`` may be a single logits array or an (main, aux) tuple when
    ``net.aux_loss`` is configured (loss_helper.py:321-346).
    """
    crit_cfg = cfg["criterion"]
    ignore = cfg.get("dataset", {}).get("ignore_label", -1)
    aux_weight = (cfg.get("net", {}).get("aux_loss", {}) or
                  {}).get("loss_weight", 0)
    kwargs = dict(crit_cfg.get("kwargs", {}))

    if crit_cfg["type"] == "ohem":
        base = functools.partial(
            ohem_cross_entropy,
            thresh=kwargs.get("thresh", 0.7),
            min_kept=int(kwargs.get("min_kept", 256)),
            ignore=ignore)
    elif kwargs.get("use_weight"):
        weights = kwargs.get("weights")
        if weights is None:
            raise ValueError(
                "use_weight requires explicit per-class 'weights' "
                "(the reference hard-codes 19 Cityscapes weights, "
                "loss_helper.py:292-315 — not meaningful here)")
        base = functools.partial(weighted_cross_entropy,
                                 weights=jnp.asarray(weights),
                                 ignore=ignore)
    else:
        base = functools.partial(cross_entropy, ignore=ignore)

    if aux_weight > 0:
        def criterion(preds, target):
            main_pred, aux_pred = preds
            return base(main_pred, target) + aux_weight * base(aux_pred,
                                                               target)

        return criterion

    def criterion(preds, target):
        return base(preds, target)

    return criterion
