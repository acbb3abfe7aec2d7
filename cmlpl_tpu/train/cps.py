"""CPS trainer — Cross Pseudo Supervision baseline
(reference ``trian_CPS.py``).

Same dual-BaseNet2 skeleton as CMLPL, but unlabeled supervision is the
hard-pseudo-label cross term with weight 0.1 (trian_CPS.py:238-249); there
are no queues and no contrastive graph.  The reference also constructs two
frozen "Ensemble" copies it never uses (trian_CPS.py:136-173) — omitted.
The reference's `regularizer` import is missing from its repo (the script
crashes as shipped); the MMD capability it wanted lives in
:mod:`cmlpl_tpu.objectives.mmd`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmlpl_tpu.data.patches import gather_spectra
from cmlpl_tpu.data.prep import PreparedScene
from cmlpl_tpu.models.basenet import BaseNet2
from cmlpl_tpu.objectives.cps import cps_cross_supervision
from cmlpl_tpu.objectives.supervised import cross_entropy
from cmlpl_tpu.train.driver import EpochDriver, stack_schedule
from cmlpl_tpu.train.state import CMLPLConfig, NetState

from typing import NamedTuple


class CPSTrainState(NamedTuple):
    net_b: NetState
    net_e: NetState
    rng: jax.Array
    step: jax.Array


class CPSTrainer(EpochDriver):
    """Fused CPS train step (trian_CPS.py:179-250)."""

    CROSS_WEIGHT = 0.1  # trian_CPS.py:245, :248

    def __init__(self, config: CMLPLConfig, mesh: Mesh | None = None,
                 donate: bool = True):
        """``donate=False`` keeps input state buffers alive (useful in
        tests that inspect the pre-step state; training loops should
        donate for buffer reuse)."""
        from cmlpl_tpu.ops.patch_gather import (
            check_gather_mesh,
            resolve_gather_impl,
        )

        config = dataclasses.replace(config, gather_impl=resolve_gather_impl(
            config.gather_impl, num_unlabel=config.num_unlabel,
            patch_size=config.patch_size, n_pc=config.n_pc,
            num_labeled=config.num_label * config.num_classes))
        self.config = config
        self.mesh = mesh

        if mesh is not None:
            d = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
            if config.labeled_batch % d or config.unlabeled_batch % d:
                raise ValueError(
                    f"labeled/unlabeled batch sizes "
                    f"({config.labeled_batch}/{config.unlabeled_batch}) "
                    f"must be divisible by the mesh data-axis size {d}")
        check_gather_mesh(config.gather_impl, mesh)
        from cmlpl_tpu.core.mesh import is_multiprocess

        self._multiproc = is_multiprocess(mesh)
        self._donate = (0,) if donate else ()
        self.model = BaseNet2(
            num_features=config.num_features, dropout=config.dropout,
            num_classes=config.num_classes, n_pc=config.n_pc,
            dtype=(jnp.bfloat16 if config.compute_dtype == "bfloat16"
                   else None))
        self.optimizer = optax.adam(config.lr)
        self._state_sh = self._state_sharding_tree()
        self._step_fn, self._epoch_fn, self._run_fn = \
            self._build_step()

    def _make_state(self, rng: jax.Array) -> CPSTrainState:
        cfg = self.config
        k_b, k_e, k_run = jax.random.split(rng, 3)
        xp = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.n_pc))
        x = jnp.zeros((1, cfg.num_features))
        params_b = self.model.init(k_b, xp, x, train=False)["params"]
        params_e = self.model.init(k_e, xp, x, train=False)["params"]
        return CPSTrainState(
            net_b=NetState(params_b, self.optimizer.init(params_b)),
            net_e=NetState(params_e, self.optimizer.init(params_e)),
            rng=k_run, step=jnp.zeros((), jnp.int32))

    def _state_sharding_tree(self):
        """Dual-BaseNet2 state shardings: same dp + opt-in dp x tp rules
        as CMLPL (core.mesh.basenet_tp_shardings) — the CPS state is the
        identical pair of networks minus the queues."""
        mesh = self.mesh
        if mesh is None:
            return None
        from cmlpl_tpu.core.mesh import basenet_tp_shardings

        repl = NamedSharding(mesh, P())
        template = jax.eval_shape(self._make_state, jax.random.key(0))

        def net_sh(net):
            return NetState(basenet_tp_shardings(mesh, net.params),
                            basenet_tp_shardings(mesh, net.opt_state))

        return CPSTrainState(
            net_b=net_sh(template.net_b), net_e=net_sh(template.net_e),
            rng=repl, step=repl)

    def init_state(self, rng: jax.Array) -> CPSTrainState:
        state = self._make_state(rng)
        if self.mesh is None:
            return state
        from cmlpl_tpu.core.mesh import place_state

        return place_state(self.mesh, state, self._state_sh)

    def _put(self, a, pspec):
        if not self._multiproc:
            return jnp.asarray(a)
        from cmlpl_tpu.core.mesh import host_to_global

        return host_to_global(NamedSharding(self.mesh, pspec), a)

    def _build_step(self):
        cfg = self.config
        model = self.model
        optimizer = self.optimizer

        def apply_net(params, xp, x, drop_rng):
            return model.apply({"params": params}, xp, x, train=True,
                               rngs={"dropout": drop_rng})

        from cmlpl_tpu.ops.patch_gather import (
            make_input_cast,
            make_train_gather,
        )

        # input/view dtype at the dispatch boundary (state.py input_dtype)
        in_cast = make_input_cast(cfg.compute_dtype, cfg.input_dtype)
        from cmlpl_tpu.ops.noise import make_noiser, two_net_views

        noisy = make_noiser(cfg.noise_impl, cfg.noise)

        pool_mode = cfg.gather_impl == "pool"
        if pool_mode:
            # pre-gathered-pool gather (see train/cmlpl.py; measured
            # +22.6% on the CMLPL fused run): bulk-gather the dispatch's
            # unique pixels once, in-scan gathers become row takes
            _, bulk_gather = make_train_gather("xla", cfg.n_pc)

            def prep_cube(padded):
                return padded

            def gather_xp(pooled, pos, cols, w):
                return jnp.take(pooled, pos, axis=0)
        else:
            prep_cube, gather_xp = make_train_gather(cfg.gather_impl,
                                                     cfg.n_pc)

        def step(state: CPSTrainState, padded, spectra, lab_idx, lab_y,
                 unl_idx, cols: int) -> Tuple[CPSTrainState, dict]:
            w = cfg.patch_size
            bt = lab_idx.shape[0]
            rng, k_noise, k_db, k_de = jax.random.split(state.rng, 4)

            xp_l = in_cast(gather_xp(padded, lab_idx, cols, w))
            x_l = in_cast(gather_spectra(spectra, lab_idx))
            xp_u = in_cast(gather_xp(padded, unl_idx, cols, w))
            x_u = in_cast(gather_spectra(spectra, unl_idx))

            xp_b, x_b, xp_e, x_e = two_net_views(
                noisy, cfg.noise_fused, k_noise, xp_l, x_l, xp_u, x_u)

            def loss_fn(params_pair):
                params_b, params_e = params_pair
                logits_b, _ = apply_net(params_b, xp_b, x_b, k_db)
                logits_e, _ = apply_net(params_e, xp_e, x_e, k_de)
                lab_b, un_b = logits_b[:bt], logits_b[bt:]
                lab_e, un_e = logits_e[:bt], logits_e[bt:]
                cls_b = cross_entropy(lab_b, lab_y)
                cls_e = cross_entropy(lab_e, lab_y)
                cross_b = cps_cross_supervision(un_b, un_e)
                cross_e = cps_cross_supervision(un_e, un_b)
                total_b = cls_b + self.CROSS_WEIGHT * cross_b
                total_e = cls_e + self.CROSS_WEIGHT * cross_e
                acc_e = jnp.mean(
                    (jnp.argmax(lab_e, axis=1) == lab_y).astype(jnp.float32))
                metrics = {"total_loss": total_b, "cls_loss": cls_b,
                           "con_loss": cross_b, "acc": acc_e}
                return total_b + total_e, metrics

            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                (state.net_b.params, state.net_e.params))
            g_b, g_e = grads
            upd_b, opt_b = optimizer.update(g_b, state.net_b.opt_state)
            upd_e, opt_e = optimizer.update(g_e, state.net_e.opt_state)
            return CPSTrainState(
                net_b=NetState(optax.apply_updates(state.net_b.params,
                                                   upd_b), opt_b),
                net_e=NetState(optax.apply_updates(state.net_e.params,
                                                   upd_e), opt_e),
                rng=rng, step=state.step + 1), metrics

        def epoch_fn(state, padded, spectra, lab_idx, lab_y, unl_idx,
                     cols: int):
            def body(carry, inputs):
                li, ly, ui = inputs
                return step(carry, padded, spectra, li, ly, ui, cols)

            return jax.lax.scan(body, state, (lab_idx, lab_y, unl_idx))

        def run_fn(state, padded, spectra, lab_idx, lab_y, unl_idx,
                   cols: int):
            """All epochs in one dispatch ((E, N, B) batch arrays)."""

            def body(carry, inputs):
                li, ly, ui = inputs
                return epoch_fn(carry, padded, spectra, li, ly, ui, cols)

            return jax.lax.scan(body, state, (lab_idx, lab_y, unl_idx))

        # entry wrappers: the configured gather's cube transform
        # (prep_cube) is applied exactly once, at the dispatch boundary —
        # the inner step/epoch/run fns receive the already-prepped cube
        # (pallas_bf16's shift-stack transform is NOT idempotent).  Pool
        # mode instead receives (P,) pool_idx and feeds the cores the
        # pooled patch/spectra tensors + positions.
        if pool_mode:
            def make_entry(core):
                def entry(state, padded, spectra, pool_idx, li, ly, ui,
                          cols):
                    # cast on the pool so per-step takes read the
                    # narrow dtype (state.py input_dtype)
                    xp_pool = in_cast(bulk_gather(padded, pool_idx, cols,
                                                  cfg.patch_size))
                    x_pool = in_cast(jnp.take(spectra, pool_idx, axis=0))
                    return core(state, xp_pool, x_pool, li, ly, ui, cols)
                return entry

            step_entry = make_entry(step)
            epoch_entry = make_entry(epoch_fn)
            run_entry = make_entry(run_fn)
            static = (7,)
            extra = (NamedSharding(self.mesh, P()),) \
                if self.mesh is not None else ()
        else:
            def step_entry(state, padded, *rest):
                return step(state, prep_cube(padded), *rest)

            def epoch_entry(state, padded, *rest):
                return epoch_fn(state, prep_cube(padded), *rest)

            def run_entry(state, padded, *rest):
                return run_fn(state, prep_cube(padded), *rest)

            static = (6,)
            extra = ()

        self._raw_run = run_entry  # train_multi_run vmaps this
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            batch_sh = NamedSharding(self.mesh, P("data"))
            epoch_sh = NamedSharding(self.mesh, P(None, "data"))
            run_sh = NamedSharding(self.mesh, P(None, None, "data"))
            state_sh = self._state_sh
            return (jax.jit(step_entry, static_argnums=static,
                            in_shardings=(state_sh, repl, repl, *extra,
                                          batch_sh, batch_sh, batch_sh),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate),
                    jax.jit(epoch_entry, static_argnums=static,
                            in_shardings=(state_sh, repl, repl, *extra,
                                          epoch_sh, epoch_sh, epoch_sh),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate),
                    jax.jit(run_entry, static_argnums=static,
                            in_shardings=(state_sh, repl, repl, *extra,
                                          run_sh, run_sh, run_sh),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate))
        return (jax.jit(step_entry, static_argnums=static,
                        donate_argnums=self._donate),
                jax.jit(epoch_entry, static_argnums=static,
                        donate_argnums=self._donate),
                jax.jit(run_entry, static_argnums=static,
                        donate_argnums=self._donate))

    def _batch_args(self, lab_idx, lab_y, unl_idx, pspec):
        """(maybe-pool, li, ly, ui) jit inputs for the three entries."""
        import numpy as np

        args = [self._put(np.asarray(lab_idx), pspec),
                self._put(np.asarray(lab_y), pspec),
                self._put(np.asarray(unl_idx), pspec)]
        pool = []
        if self.config.gather_impl == "pool":
            from cmlpl_tpu.ops.patch_gather import poolify_batches

            p, li_p, ui_p = poolify_batches(lab_idx, unl_idx)
            pool = [self._put(p, P())]
            args[0] = self._put(li_p, pspec)
            args[2] = self._put(ui_p, pspec)
        return pool + args

    def train_step(self, state, scene: PreparedScene, lab_idx, lab_y,
                   unl_idx):
        return self._step_fn(
            state, self._put(scene.padded_pca, P()),
            self._put(scene.spectra, P()),
            *self._batch_args(lab_idx, lab_y, unl_idx, P("data")),
            scene.cols)

    def train_epoch(self, state, scene: PreparedScene, lab_idx, lab_y,
                    unl_idx):
        """One epoch in a single dispatch over stacked batch arrays."""
        return self._epoch_fn(
            state, self._put(scene.padded_pca, P()),
            self._put(scene.spectra, P()),
            *self._batch_args(lab_idx, lab_y, unl_idx, P(None, "data")),
            scene.cols)

    def train_run(self, state, scene: PreparedScene, sampler):
        """The whole schedule ((E, N, B) pre-drawn batches) in one
        dispatch."""
        li, ly, ui = stack_schedule(sampler, self.config.num_epochs)
        return self._run_fn(
            state, self._put(scene.padded_pca, P()),
            self._put(scene.spectra, P()),
            *self._batch_args(li, ly, ui, P(None, None, "data")),
            scene.cols)

    def _format_log(self, epoch, batch_index, num_batches, m):
        return (f"Epoch {epoch + 1}/{self.config.num_epochs}: "
                f"{batch_index + 1}/{num_batches} "
                f"total_loss={m['total_loss']:.4f} "
                f"cls_loss={m['cls_loss']:.4f} "
                f"con_loss={m['con_loss']:.4f} "
                f"acc={m['acc'] * 100:.2f}")
