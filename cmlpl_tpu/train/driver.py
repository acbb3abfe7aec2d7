"""Shared epoch/fit driver for the semi-supervised trainers.

The reference repeats the same epoch/batch loop in its three training
scripts (train.py:146-289, trian_CPS.py:175-269, trian_CCT.py:170-244);
round 1 of this rebuild mirrored that as three diverging ``fit()``
copies.  :class:`EpochDriver` is the single driver all three trainers
now inherit, with CMLPL's full feature set everywhere:

- ``scan_epochs``: run each epoch as one fused ``lax.scan`` dispatch
  (numerically identical to per-step; pinned by tests/test_scan_epoch.py).
- whole-run fusion: with no resume/hook host work, the entire schedule
  runs as ONE dispatch (``train_run``) — on a remote-attached TPU this is
  the difference between ~20 dispatch round-trips and one.
- ``start_epoch`` (resume) + ``on_epoch_end(epoch, state)`` (periodic
  checkpointing).

Subclasses provide ``config``/``train_run`` and the per-algorithm hooks:
``_fit_epoch`` / ``_fit_step`` (CMLPL threads the epoch number through
for the adaptive threshold; CPS/CCT ignore it) and ``_format_log``.
"""

from __future__ import annotations

import jax
import numpy as np


def stack_schedule(sampler, num_epochs: int):
    """Pre-draw every epoch's shuffled batches -> three (E, N, B) arrays
    (labeled idx, labeled y, unlabeled idx), the input shape of the
    whole-run scan."""
    epochs = []
    for _ in range(num_epochs):
        batches = list(sampler.epoch())
        epochs.append(tuple(np.stack([b[i] for b in batches])
                            for i in range(3)))
    return tuple(np.stack([e[i] for e in epochs]) for i in range(3))


class EpochDriver:
    """Mixin: the one epoch/batch loop shared by CMLPL / CPS / CCT."""

    # -- per-algorithm adapters (override as needed) -------------------- #
    def _fit_epoch(self, state, scene, li, ly, ui, epoch: int):
        return self.train_epoch(state, scene, li, ly, ui)

    def _fit_step(self, state, scene, li, ly, ui, epoch: int,
                  batch_index: int):
        return self.train_step(state, scene, li, ly, ui)

    def _format_log(self, epoch, batch_index, num_batches, m) -> str:
        parts = " ".join(f"{k}={v:.4f}" for k, v in m.items()
                         if k != "acc")
        return (f"Epoch {epoch + 1}/{self.config.num_epochs}: "
                f"{batch_index + 1}/{num_batches} {parts} "
                f"acc={m.get('acc', float('nan')) * 100:.2f}")

    # -- the driver ------------------------------------------------------#
    def fit(self, state, scene, sampler, *, log_every: int = 10,
            log_fn=print, scan_epochs: bool = True, start_epoch: int = 0,
            on_epoch_end=None):
        """Epoch driver.  ``start_epoch`` supports resume;
        ``on_epoch_end(epoch, state)`` hooks periodic checkpointing.
        When no per-epoch host work is requested, the whole schedule is
        one fused dispatch."""
        cfg = self.config
        history = []
        if (scan_epochs and start_epoch == 0 and on_epoch_end is None
                and cfg.num_epochs > 1):
            state, stacked = self.train_run(state, scene, sampler)
            stacked = jax.device_get(stacked)
            e, n = next(iter(stacked.values())).shape
            for ep in range(e):
                history.extend({k: v[ep, i] for k, v in stacked.items()}
                               for i in range(n))
                if log_every:
                    log_fn(self._format_log(ep, n - 1, n, {
                        k: float(np.mean(v[ep, -log_every:]))
                        for k, v in stacked.items()}))
            return state, history

        for epoch in range(start_epoch, cfg.num_epochs):
            if scan_epochs:
                batches = list(sampler.epoch())
                li = np.stack([b[0] for b in batches])
                ly = np.stack([b[1] for b in batches])
                ui = np.stack([b[2] for b in batches])
                state, stacked = self._fit_epoch(state, scene, li, ly, ui,
                                                 epoch)
                stacked = jax.device_get(stacked)
                n = li.shape[0]
                history.extend(
                    {k: v[i] for k, v in stacked.items()} for i in range(n))
                if log_every:
                    for b in range(log_every - 1, n, log_every):
                        lo = b - log_every + 1
                        log_fn(self._format_log(epoch, b, n, {
                            k: float(np.mean(v[lo:b + 1]))
                            for k, v in stacked.items()}))
            else:
                for batch_index, (li, ly, ui) in enumerate(sampler.epoch()):
                    state, metrics = self._fit_step(state, scene, li, ly,
                                                    ui, epoch, batch_index)
                    history.append(metrics)
                    if log_every and (batch_index + 1) % log_every == 0:
                        m = {k: float(v)
                             for k, v in jax.device_get(metrics).items()}
                        log_fn(self._format_log(
                            epoch, batch_index,
                            sampler.batches_per_epoch, m))
            if on_epoch_end is not None:
                on_epoch_end(epoch, state)
        return state, history
