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
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


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

    # -- fused multi-seed runs ------------------------------------------- #
    def _run_extras(self):
        """Per-run replicated arrays appended between the batch arrays and
        the static ``cols`` in the raw run entry's signature (CMLPL's
        per-epoch adaptive-threshold vector; empty for CPS/CCT)."""
        return ()

    def _multi_state_sh(self, shard_seed: bool):
        """State shardings for the seed-stacked tree: every leaf is
        sharded on its leading seed dim over ``data`` (when divisible)
        and replicated otherwise.  Tensor-parallel specs are deliberately
        NOT composed with the seed axis: inside the shard_map body each
        seed's run is the complete unpartitioned program (TP would need
        collectives inside the body); use the serial --num_iters loop
        when dp x tp sharding is the point."""
        lead = "data" if shard_seed else None
        sh = NamedSharding(self.mesh, P(lead))
        return jax.tree_util.tree_map(lambda _: sh, self._state_sh)

    def _get_multi_fn(self, num_iters: int, cols: int, pool_mode: bool,
                      n_extras: int):
        """Cached fused multi-seed entry: ``vmap(raw_run)`` over a leading
        seed axis.

        On a mesh with a divisible seed count the seed axis is placed via
        ``shard_map`` — each device runs the UNPARTITIONED vmapped program
        on its local seed block.  Deliberately NOT GSPMD in_shardings:
        letting the partitioner shard the vmapped (batch-grouped) convs
        MISCOMPILES on XLA:CPU — a sharded vmap-over-weights 1x1 conv
        returns wrong values outright (sum -392 vs +409 on a 2-device
        mesh; 3x3 convs are exact, the unsharded vmap matches the serial
        loop bitwise — minimally reproduced 2026-08-17, jax 0.9.0).
        shard_map sidesteps the partitioner entirely and is also the
        honest expression of an embarrassingly parallel axis.
        """
        cache = getattr(self, "_multi_cache", None)
        if cache is None:
            cache = self._multi_cache = {}
        key = (num_iters, cols)
        if key in cache:
            return cache[key]

        raw = self._raw_run

        def bound(*a):
            return raw(*a, cols)

        in_axes = ((0, None, None) + ((0,) if pool_mode else ())
                   + (0, 0, 0) + (None,) * n_extras)
        vf = jax.vmap(bound, in_axes=in_axes)
        if self.mesh is None:
            fn = jax.jit(vf, donate_argnums=self._donate)
        else:
            d = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape)).get("data", 1)
            shard_seed = num_iters % d == 0
            repl = NamedSharding(self.mesh, P())
            state_sh = self._multi_state_sh(shard_seed)
            if shard_seed:
                seed = P("data")
                in_specs = ((seed, P(), P())
                            + ((seed,) if pool_mode else ())
                            + (seed, seed, seed) + (P(),) * n_extras)
                body = jax.shard_map(vf, mesh=self.mesh,
                                     in_specs=in_specs,
                                     out_specs=(seed, seed),
                                     check_vma=False)
                seed_sh = NamedSharding(self.mesh, seed)
                in_sh = ((state_sh, repl, repl)
                         + ((seed_sh,) if pool_mode else ())
                         + (seed_sh, seed_sh, seed_sh)
                         + (repl,) * n_extras)
                fn = jax.jit(body, in_shardings=in_sh,
                             out_shardings=(state_sh, seed_sh),
                             donate_argnums=self._donate)
            else:
                # replicated fallback: every device runs all seeds (no
                # sharded operands -> nothing for the partitioner to get
                # wrong; equality vs the single-device path is pinned in
                # tests/test_multi_run.py)
                in_sh = ((state_sh, repl, repl)
                         + ((repl,) if pool_mode else ())
                         + (repl, repl, repl) + (repl,) * n_extras)
                fn = jax.jit(vf, in_shardings=in_sh,
                             out_shardings=(state_sh, repl),
                             donate_argnums=self._donate)
        cache[key] = fn
        return fn

    def train_multi_run(self, rng, scene, sampler, num_iters: int):
        """ALL ``num_iters`` independent training runs as ONE dispatch.

        The reference repeats its whole train/eval loop serially per
        iteration (train.py:72, ``for index_iter in range(num_iters)``)
        to report mean±std OA; here the runs are independent by
        construction, so the whole-run entry is ``jax.vmap``-ed over a
        leading seed axis and the seed axis is sharded over the mesh's
        ``data`` axis (when divisible) — N seeds on N devices cost one
        run's wall time, and even on one chip the runs share a single
        dispatch/compile.  Per-seed init and schedule draws replay the
        serial CLI loop exactly (``fold_in(rng, i)`` init, schedules
        drawn iter-major from the same host sampler), so results are
        the serial path's, just stacked: returns ``(state, metrics)``
        with a leading ``num_iters`` dim on every leaf.
        """
        cfg = self.config
        states = [self._make_state(jax.random.fold_in(rng, i))
                  for i in range(num_iters)]
        state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        scheds = [stack_schedule(sampler, cfg.num_epochs)
                  for _ in range(num_iters)]
        li = np.stack([s[0] for s in scheds])
        ly = np.stack([s[1] for s in scheds])
        ui = np.stack([s[2] for s in scheds])

        pool_mode = cfg.gather_impl == "pool"
        pool_args = []
        seed_spec = P("data")
        if self.mesh is not None:
            d = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape)).get("data", 1)
            if num_iters % d:
                seed_spec = P()
        if pool_mode:
            from cmlpl_tpu.ops.patch_gather import poolify_batches

            pools, lis, uis = [], [], []
            for i in range(num_iters):
                p, lp, up = poolify_batches(li[i], ui[i])
                pools.append(p)
                lis.append(lp)
                uis.append(up)
            plen = max(len(p) for p in pools)
            pools = [np.concatenate(
                [p, np.full(plen - len(p), p[0], p.dtype)]) for p in pools]
            pool_args = [self._put(np.stack(pools), seed_spec)]
            li, ui = np.stack(lis), np.stack(uis)

        extras = tuple(self._put(e, P()) for e in self._run_extras())
        fn = self._get_multi_fn(num_iters, scene.cols, pool_mode,
                                len(extras))
        if self.mesh is not None:
            shard_seed = seed_spec != P()
            state = self._place_multi_state(state, shard_seed)
        return fn(state, self._put(scene.padded_pca, P()),
                  self._put(scene.spectra, P()), *pool_args,
                  self._put(li, seed_spec), self._put(ly, seed_spec),
                  self._put(ui, seed_spec), *extras)

    def _place_multi_state(self, state, shard_seed: bool):
        sh = self._multi_state_sh(shard_seed)
        if self._multiproc:
            from cmlpl_tpu.core.mesh import host_to_global

            return jax.tree_util.tree_map(
                lambda a, s: host_to_global(s, a), state, sh)
        return jax.device_put(state, sh)

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
