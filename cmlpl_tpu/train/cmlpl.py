"""CMLPL trainer — the paper's algorithm as one fused, jitted train step.

Reference: the hot loop at ``train.py:146-289``.  Differences that make it
TPU-native (behaviour-preserving):

- **One XLA graph per step.**  The reference runs two separate backwards
  (train.py:267, :271); because every cross-network term is ``detach()``'d,
  gradients over the concatenated parameter pair are identical, so we take
  ``jax.grad`` once over both networks and apply two optimizer updates in
  the same graph.
- **Batches are pixel indices.**  Patch/spectrum gathering, Gaussian noise
  views, the queue smoothing, and both optimizer updates all happen on
  device; the host sends 2x128 int32 per step instead of eight
  (128, 60, 20, 20) tensors (train.py:157-184).
- **Queues are functional state** (see objectives/queue.py).
- **Data parallel for free**: the step is jitted with batch indices sharded
  over the mesh's ``data`` axis and everything else replicated; XLA/GSPMD
  inserts the gradient reductions and the all-gathers needed by the global
  128x128 similarity/graph matrices over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmlpl_tpu.data.augment import (
    mixture_noise,
    radiation_noise,
    random_flip,
    random_rot90,
)
from cmlpl_tpu.data.patches import gather_spectra
from cmlpl_tpu.data.prep import PreparedScene
from cmlpl_tpu.models.basenet import BaseNet2
from cmlpl_tpu.objectives.cmlpl import (
    adaptive_threshold,
    graph_contrastive,
    pseudo_label_graph,
    soft_consistency,
)
from cmlpl_tpu.objectives.contrastive import (
    memobank_contrastive,
    memobank_init,
    nt_xent,
)
from cmlpl_tpu.objectives.mmd import mmd_loss
from cmlpl_tpu.objectives.queue import memory_smooth, queue_init, queue_update
from cmlpl_tpu.objectives.supervised import cross_entropy
from cmlpl_tpu.train.driver import EpochDriver, stack_schedule
from cmlpl_tpu.train.state import CMLPLConfig, CMLPLTrainState, NetState


class CMLPLTrainer(EpochDriver):
    """Builds and drives the fused CMLPL train step."""

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
        self.optimizer = optax.adam(config.lr)  # torch Adam defaults match
        self._state_sh = self._state_sharding_tree()
        self._step_fn, self._epoch_fn, self._run_fn = self._build_step()

    # ------------------------------------------------------------------ #
    def _make_state(self, rng: jax.Array) -> CMLPLTrainState:
        cfg = self.config
        k_b, k_e, k_run = jax.random.split(rng, 3)
        xp = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.n_pc))
        x = jnp.zeros((1, cfg.num_features))
        params_b = self.model.init(k_b, xp, x, train=False)["params"]
        params_e = self.model.init(k_e, xp, x, train=False)["params"]
        bank = ()
        if cfg.extra_loss == "memobank":
            bank = memobank_init(cfg.num_classes, cfg.memobank_size,
                                 cfg.feat_dim)
        return CMLPLTrainState(
            net_b=NetState(params_b, self.optimizer.init(params_b)),
            net_e=NetState(params_e, self.optimizer.init(params_e)),
            queue_w=queue_init(cfg.queue_size, cfg.feat_dim, cfg.num_classes),
            queue_s=queue_init(cfg.queue_size, cfg.feat_dim, cfg.num_classes),
            rng=k_run,
            step=jnp.zeros((), jnp.int32),
            bank=bank,
        )

    def _state_sharding_tree(self):
        """Shardings for every state leaf.

        1-D ("data",) mesh: everything replicated (pure dp).
        2-D ("data", "model") mesh: tensor parallelism over the wide
        spectral dimension — feat_spe weights column-sharded (output dim
        1024 over "model"), the classifier row-sharded (contraction dim),
        and the pseudo-label queue features feature-sharded.  GSPMD then
        inserts the TP collectives: psum for the l2-norm and the
        queue-smoothing similarity matmuls (both contract the sharded
        1024 dim), all-gathers where replicated activations are needed.
        Adam moments inherit their parameter's sharding via the same
        path rules.
        """
        mesh = self.mesh
        if mesh is None:
            return None
        repl = NamedSharding(mesh, P())
        template = jax.eval_shape(self._make_state, jax.random.key(0))
        if "model" not in mesh.axis_names:
            return jax.tree_util.tree_map(lambda _: repl, template)

        from cmlpl_tpu.core.mesh import basenet_tp_shardings

        def net_sh(net):
            return NetState(
                basenet_tp_shardings(mesh, net.params),
                basenet_tp_shardings(mesh, net.opt_state))

        queue_sh = type(template.queue_w)(
            feats=NamedSharding(mesh, P(None, "model")),
            probs=repl, ptr=repl)
        return CMLPLTrainState(
            net_b=net_sh(template.net_b), net_e=net_sh(template.net_e),
            queue_w=queue_sh, queue_s=queue_sh, rng=repl, step=repl,
            bank=jax.tree_util.tree_map(lambda _: repl, template.bank))

    def init_state(self, rng: jax.Array) -> CMLPLTrainState:
        state = self._make_state(rng)
        if self.mesh is None:
            return state
        if self._multiproc:
            # pod path: device_put rejects non-addressable shardings;
            # form global arrays from the (seed-identical) host state
            from cmlpl_tpu.core.mesh import host_to_global

            return jax.tree_util.tree_map(
                lambda a, sh: host_to_global(sh, a), state,
                self._state_sh)
        return jax.device_put(state, self._state_sh)

    def _put(self, a, pspec):
        """Host->device for a step/epoch/run input: plain asarray on one
        process; a global array (every process holds the same host copy)
        on a multi-process mesh."""
        if not self._multiproc:
            return jnp.asarray(a)
        from cmlpl_tpu.core.mesh import host_to_global

        return host_to_global(NamedSharding(self.mesh, pspec), a)

    # ------------------------------------------------------------------ #
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
            # pre-gathered-pool mode: one bulk windowed gather of the
            # ~10,045 unique training pixels per DISPATCH (~0.97 GB HBM
            # at the reference schedule), then every step's "gather" is a
            # contiguous row-take by pool position — attacks the ~30%
            # per-step windowed-DMA share of the fused-run profile
            # (replaces the reference's materialise-everything design,
            # hyper_tools.py:226-243, without the 18.5 GiB all-pixels
            # tensor).  step() is unchanged: it receives the pooled
            # patches/spectra as its cube/spectra args and positions as
            # its index args.
            _, bulk_gather = make_train_gather("xla", cfg.n_pc)

            def prep_cube(padded):
                return padded

            def gather_xp(pooled, pos, cols, w):
                return jnp.take(pooled, pos, axis=0)
        else:
            prep_cube, gather_xp = make_train_gather(cfg.gather_impl,
                                                     cfg.n_pc)

        def step(state: CMLPLTrainState, padded, spectra, lab_idx, lab_y,
                 unl_idx, adap_mask_thr, warm,
                 cols: int) -> Tuple[CMLPLTrainState, dict]:
            w = cfg.patch_size
            bt = lab_idx.shape[0]

            if cfg.extra_loss or cfg.augment:
                (rng, k_noise, k_drop_b, k_drop_e, k_extra,
                 k_aug) = jax.random.split(state.rng, 6)
            else:
                rng, k_noise, k_drop_b, k_drop_e = jax.random.split(
                    state.rng, 4)
            # on-device gather (train.py:156-167 did host->device copies);
            # ``padded`` arrives pre-prepped (prep_cube) from the entry fns
            xp_l = in_cast(gather_xp(padded, lab_idx, cols, w))
            x_l = in_cast(gather_spectra(spectra, lab_idx))
            xp_u = in_cast(gather_xp(padded, unl_idx, cols, w))
            x_u = in_cast(gather_spectra(spectra, unl_idx))

            if cfg.augment:
                # opt-in patch augmentations (hsi_loader.py:58-107)
                ak = jax.random.split(k_aug, 8)

                def augmented(xp, keys, labels=None):
                    i = 0
                    if "flip" in cfg.augment:
                        xp = random_flip(keys[i], xp)
                        i += 1
                    if "rot90" in cfg.augment:
                        xp = random_rot90(keys[i], xp)
                        i += 1
                    if "radiation" in cfg.augment:
                        xp = radiation_noise(keys[i], xp)
                        i += 1
                    if "mixture" in cfg.augment and labels is not None:
                        xp = mixture_noise(keys[i], xp, labels)
                    return xp

                xp_l = augmented(xp_l, ak[:4], lab_y)
                xp_u = augmented(xp_u, ak[4:])

            # independent Gaussian views per net (train.py:157-184)
            xp_b_all, x_b_all, xp_e_all, x_e_all = two_net_views(
                noisy, cfg.noise_fused, k_noise, xp_l, x_l, xp_u, x_u)

            onehot = jax.nn.one_hot(lab_y, cfg.num_classes,
                                    dtype=jnp.float32)

            def loss_fn(params_pair):
                params_b, params_e = params_pair
                if cfg.stack_nets:
                    # one batched forward over a leading net axis: every
                    # conv/matmul runs once at 2x batch (same params,
                    # inputs, and per-net dropout keys -> numerically
                    # identical to the two-call path)
                    stacked = jax.tree_util.tree_map(
                        lambda a, b: jnp.stack([a, b]),
                        params_b, params_e)
                    logits_all, feat_all = jax.vmap(apply_net)(
                        stacked,
                        jnp.stack([xp_b_all, xp_e_all]),
                        jnp.stack([x_b_all, x_e_all]),
                        jnp.stack([k_drop_b, k_drop_e]))
                    logits_b_all, logits_e_all = logits_all[0], logits_all[1]
                    feat_b_all, feat_e_all = feat_all[0], feat_all[1]
                else:
                    logits_b_all, feat_b_all = apply_net(
                        params_b, xp_b_all, x_b_all, k_drop_b)
                    logits_e_all, feat_e_all = apply_net(
                        params_e, xp_e_all, x_e_all, k_drop_e)

                lab_b, un_b = logits_b_all[:bt], logits_b_all[bt:]
                feat_lab_b, xs = feat_b_all[:bt], feat_b_all[bt:]
                lab_e, un_e = logits_e_all[:bt], logits_e_all[bt:]
                feat_lab_e, xw = feat_e_all[:bt], feat_e_all[bt:]

                cls_b = cross_entropy(lab_b, lab_y)
                cls_e = cross_entropy(lab_e, lab_y)

                # ---- no-grad block (train.py:195-237) ----
                probs_orig = jax.nn.softmax(lax.stop_gradient(un_e), axis=1)
                probs_orig1 = jax.nn.softmax(lax.stop_gradient(un_b), axis=1)
                smoothed_w = memory_smooth(
                    lax.stop_gradient(xw), probs_orig, state.queue_w,
                    cfg.alpha, cfg.temperature)
                smoothed_s = memory_smooth(
                    lax.stop_gradient(xs), probs_orig1, state.queue_s,
                    cfg.alpha, cfg.temperature)
                probs = jnp.where(warm, smoothed_w, probs_orig)
                probs1 = jnp.where(warm, smoothed_s, probs_orig1)

                mask = (jnp.max(probs, axis=1)
                        >= adap_mask_thr).astype(jnp.float32)
                masks = (jnp.max(probs1, axis=1)
                         >= adap_mask_thr).astype(jnp.float32)

                # queue writes: [other-net unlabeled feats, own labeled
                # feats] with pre-smoothing probs / one-hot labels
                # (train.py:223-237)
                new_queue_w = queue_update(
                    state.queue_w,
                    jnp.concatenate([lax.stop_gradient(xw),
                                     lax.stop_gradient(feat_lab_b)], axis=0),
                    jnp.concatenate([probs_orig, onehot], axis=0))
                new_queue_s = queue_update(
                    state.queue_s,
                    jnp.concatenate([lax.stop_gradient(xs),
                                     lax.stop_gradient(feat_lab_e)], axis=0),
                    jnp.concatenate([probs_orig1, onehot], axis=0))

                # ---- consistency (train.py:239-242) ----
                con_b = soft_consistency(un_b, probs, mask)
                con_e = soft_consistency(un_e, probs1, masks)

                # ---- contrastive pseudo-label graph (train.py:243-265) --
                q, qn = pseudo_label_graph(probs1, probs)
                contrast_b = graph_contrastive(
                    xs, lax.stop_gradient(xw), q, qn, cfg.temperature)
                contrast_e = graph_contrastive(
                    lax.stop_gradient(xs), xw, q, qn, cfg.temperature)

                total_b = (cls_b + cfg.w_contrast * contrast_b
                           + cfg.w_consistency * con_b)
                total_e = (cls_e + cfg.w_contrast * contrast_e
                           + cfg.w_consistency * con_e)

                # ---- opt-in extra objective (dead in the reference:
                # loss_helper.py imports at trian_CPS.py:15-19,
                # models.py:14-39 ContrastiveLoss, missing `regularizer`
                # MMD) — invocable here via config.extra_loss ----
                new_bank = state.bank
                if cfg.extra_loss == "ntxent":
                    # the two nets' views of the same unlabeled samples
                    extra_b = nt_xent(xs, lax.stop_gradient(xw),
                                      cfg.temperature)
                    extra_e = nt_xent(lax.stop_gradient(xs), xw,
                                      cfg.temperature)
                elif cfg.extra_loss == "mmd":
                    # align labeled/unlabeled feature distributions
                    extra_b = mmd_loss(feat_lab_b, xs)
                    extra_e = mmd_loss(feat_lab_e, xw)
                elif cfg.extra_loss == "memobank":
                    # U2PL InfoNCE: net E (teacher, smoothed probs)
                    # teaches net B.  The reference's percentile
                    # entropy split (loss_helper.py:54-63) becomes a
                    # fixed-shape median split for jit.
                    ent = -jnp.sum(probs * jnp.log(probs + 1e-10),
                                   axis=1)
                    med = jnp.median(ent)
                    pl = jnp.argmax(probs, axis=1)
                    extra_b, new_bank = memobank_contrastive(
                        xs, lax.stop_gradient(xw), probs, pl,
                        ent <= med, ent > med, state.bank, k_extra,
                        num_queries=32, num_negatives=16,
                        temperature=0.5)
                    extra_e = jnp.float32(0.0)
                else:
                    extra_b = extra_e = jnp.float32(0.0)
                total_b = total_b + cfg.extra_weight * extra_b
                total_e = total_e + cfg.extra_weight * extra_e

                acc_e = jnp.mean(
                    (jnp.argmax(lab_e, axis=1) == lab_y).astype(jnp.float32))
                metrics = {
                    "loss_contrast": contrast_b,
                    "total_loss": total_b,
                    "cls_loss": cls_b,
                    "con_loss": con_b,
                    "total_loss_e": total_e,
                    "acc": acc_e,
                    "mask_rate": jnp.mean(mask),
                }
                if cfg.extra_loss:
                    metrics["extra_loss"] = extra_b
                return total_b + total_e, (new_queue_w, new_queue_s,
                                           new_bank, metrics)

            grads, (new_queue_w, new_queue_s, new_bank, metrics) = jax.grad(
                loss_fn, has_aux=True)((state.net_b.params,
                                        state.net_e.params))
            g_b, g_e = grads
            upd_b, opt_b = optimizer.update(g_b, state.net_b.opt_state,
                                            state.net_b.params)
            upd_e, opt_e = optimizer.update(g_e, state.net_e.opt_state,
                                            state.net_e.params)
            new_state = CMLPLTrainState(
                net_b=NetState(optax.apply_updates(state.net_b.params,
                                                   upd_b), opt_b),
                net_e=NetState(optax.apply_updates(state.net_e.params,
                                                   upd_e), opt_e),
                queue_w=new_queue_w,
                queue_s=new_queue_s,
                rng=rng,
                step=state.step + 1,
                bank=new_bank,
            )
            return new_state, metrics

        def epoch_scan(state, prepped, spectra, lab_idx, lab_y, unl_idx,
                       adap_mask_thr, epoch_gt0, cols):
            """A whole epoch as one lax.scan: identical math to the
            per-step path (same rng threading), one dispatch instead of
            ~79 — per-step host dispatch over a remote TPU link costs more
            than the step's compute.  ``prepped`` = prep_cube(padded)
            (or the pooled patch tensor in pool mode)."""

            def body(carry, inputs):
                i, li, ly, ui = inputs
                warm = jnp.logical_or(epoch_gt0, i > cfg.queue_batch)
                return step(carry, prepped, spectra, li, ly, ui,
                            adap_mask_thr, warm, cols)

            n = lab_idx.shape[0]
            steps = jnp.arange(n, dtype=jnp.int32)
            return lax.scan(body, state, (steps, lab_idx, lab_y, unl_idx))

        def run_core(state, prepped, spectra, lab_idx, lab_y, unl_idx,
                     adap_per_epoch, cols):
            """The ENTIRE training run as one dispatch: scan over epochs
            of scans over steps.  Batch arrays are (E, N, B); the
            per-epoch adaptive threshold comes in as an (E,) array and
            the warmup flag is computed from the epoch/step counters —
            identical math to fit()'s per-epoch path."""

            def epoch_body(carry, xs):
                e_idx, li_e, ly_e, ui_e, adap_e = xs
                return epoch_scan(carry, prepped, spectra, li_e, ly_e,
                                  ui_e, adap_e, e_idx > 0, cols)

            e = lab_idx.shape[0]
            epochs = jnp.arange(e, dtype=jnp.int32)
            return lax.scan(epoch_body, state,
                            (epochs, lab_idx, lab_y, unl_idx,
                             adap_per_epoch))

        if pool_mode:
            # entry fns take the extra (P,) pool_idx of unique pixel ids;
            # the bulk gather + spectra pooling runs ONCE per dispatch
            # and the scans index rows by pool position
            def pool_inputs(padded, spectra, pool_idx, cols):
                # the cast runs here, on the ~10k-row pool, so the
                # per-step row takes read the narrow dtype from HBM
                xp_pool = in_cast(bulk_gather(padded, pool_idx, cols,
                                              cfg.patch_size))
                return xp_pool, in_cast(jnp.take(spectra, pool_idx,
                                                 axis=0))

            def step_entry(state, padded, spectra, pool_idx, lab_idx,
                           lab_y, unl_idx, adap_mask_thr, warm, cols):
                xp_pool, x_pool = pool_inputs(padded, spectra, pool_idx,
                                              cols)
                return step(state, xp_pool, x_pool, lab_idx, lab_y,
                            unl_idx, adap_mask_thr, warm, cols)

            def epoch_fn(state, padded, spectra, pool_idx, lab_idx, lab_y,
                         unl_idx, adap_mask_thr, epoch_gt0, cols):
                xp_pool, x_pool = pool_inputs(padded, spectra, pool_idx,
                                              cols)
                return epoch_scan(state, xp_pool, x_pool, lab_idx, lab_y,
                                  unl_idx, adap_mask_thr, epoch_gt0, cols)

            def run_fn(state, padded, spectra, pool_idx, lab_idx, lab_y,
                       unl_idx, adap_per_epoch, cols):
                xp_pool, x_pool = pool_inputs(padded, spectra, pool_idx,
                                              cols)
                return run_core(state, xp_pool, x_pool, lab_idx, lab_y,
                                unl_idx, adap_per_epoch, cols)

            self._raw_run = run_fn  # train_multi_run vmaps this
            if self.mesh is not None:
                repl = NamedSharding(self.mesh, P())
                batch_sh = NamedSharding(self.mesh, P("data"))
                epoch_sh = NamedSharding(self.mesh, P(None, "data"))
                run_sh = NamedSharding(self.mesh, P(None, None, "data"))
                state_sh = self._state_sh
                return (
                    jax.jit(step_entry, static_argnums=(9,),
                            in_shardings=(state_sh, repl, repl, repl,
                                          batch_sh, batch_sh, batch_sh,
                                          repl, repl),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate),
                    jax.jit(epoch_fn, static_argnums=(9,),
                            in_shardings=(state_sh, repl, repl, repl,
                                          epoch_sh, epoch_sh, epoch_sh,
                                          repl, repl),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate),
                    jax.jit(run_fn, static_argnums=(8,),
                            in_shardings=(state_sh, repl, repl, repl,
                                          run_sh, run_sh, run_sh, repl),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate))
            return (jax.jit(step_entry, static_argnums=(9,),
                            donate_argnums=self._donate),
                    jax.jit(epoch_fn, static_argnums=(9,),
                            donate_argnums=self._donate),
                    jax.jit(run_fn, static_argnums=(8,),
                            donate_argnums=self._donate))

        def step_entry(state, padded, spectra, lab_idx, lab_y, unl_idx,
                       adap_mask_thr, warm, cols):
            return step(state, prep_cube(padded), spectra, lab_idx, lab_y,
                        unl_idx, adap_mask_thr, warm, cols)

        def epoch_fn(state, padded, spectra, lab_idx, lab_y, unl_idx,
                     adap_mask_thr, epoch_gt0, cols):
            return epoch_scan(state, prep_cube(padded), spectra, lab_idx,
                              lab_y, unl_idx, adap_mask_thr, epoch_gt0,
                              cols)

        def run_fn(state, padded, spectra, lab_idx, lab_y, unl_idx,
                   adap_per_epoch, cols):
            return run_core(state, prep_cube(padded), spectra, lab_idx,
                            lab_y, unl_idx, adap_per_epoch, cols)

        self._raw_run = run_fn  # train_multi_run vmaps this
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            batch_sh = NamedSharding(self.mesh, P("data"))
            epoch_sh = NamedSharding(self.mesh, P(None, "data"))
            run_sh = NamedSharding(self.mesh, P(None, None, "data"))
            state_sh = self._state_sh
            jit_step = jax.jit(
                step_entry,
                static_argnums=(8,),
                in_shardings=(state_sh, repl, repl, batch_sh, batch_sh,
                              batch_sh, repl, repl),
                out_shardings=(state_sh, repl),
                donate_argnums=self._donate,
            )
            jit_epoch = jax.jit(
                epoch_fn,
                static_argnums=(8,),
                in_shardings=(state_sh, repl, repl, epoch_sh, epoch_sh,
                              epoch_sh, repl, repl),
                out_shardings=(state_sh, repl),
                donate_argnums=self._donate,
            )
            jit_run = jax.jit(
                run_fn,
                static_argnums=(7,),
                in_shardings=(state_sh, repl, repl, run_sh, run_sh, run_sh,
                              repl),
                out_shardings=(state_sh, repl),
                donate_argnums=self._donate,
            )
            return jit_step, jit_epoch, jit_run
        return (jax.jit(step_entry, static_argnums=(8,),
                        donate_argnums=self._donate),
                jax.jit(epoch_fn, static_argnums=(8,),
                        donate_argnums=self._donate),
                jax.jit(run_fn, static_argnums=(7,),
                        donate_argnums=self._donate))

    # ------------------------------------------------------------------ #
    def _run_extras(self):
        """Per-epoch adaptive-threshold vector, replicated across the
        seed axis of a fused multi-seed run (train.py:147-148 computes
        it from the epoch number only, so it is seed-independent)."""
        return (np.asarray([self._adaptive_thr(e)
                            for e in range(self.config.num_epochs)],
                           np.float32),)

    def _adaptive_thr(self, epoch: int) -> float:
        cfg = self.config
        return float(np.exp(-0.5 * (epoch / cfg.num_epochs) ** 2)) * cfg.thr

    @staticmethod
    def _poolify(lab_idx, unl_idx):
        from cmlpl_tpu.ops.patch_gather import poolify_batches

        return poolify_batches(lab_idx, unl_idx)

    def train_step(self, state, scene: PreparedScene, lab_idx, lab_y,
                   unl_idx, epoch: int, batch_index: int):
        """One optimisation step.  ``epoch``/``batch_index`` drive the
        adaptive threshold (train.py:147-148) and queue warmup
        (train.py:212)."""
        cfg = self.config
        warm = bool(epoch > 0 or batch_index > cfg.queue_batch)
        b = P("data")
        args = [self._put(np.asarray(lab_idx), b),
                self._put(np.asarray(lab_y), b),
                self._put(np.asarray(unl_idx), b)]
        pool = []
        if cfg.gather_impl == "pool":
            p, li_p, ui_p = self._poolify(lab_idx, unl_idx)
            pool = [self._put(p, P())]
            args[0] = self._put(li_p, b)
            args[2] = self._put(ui_p, b)
        return self._step_fn(
            state, self._put(scene.padded_pca, P()),
            self._put(scene.spectra, P()), *pool, *args,
            self._put(np.float32(self._adaptive_thr(epoch)), P()),
            self._put(np.asarray(warm), P()),
            scene.cols)

    def train_epoch(self, state, scene: PreparedScene, lab_idx, lab_y,
                    unl_idx, epoch: int):
        """One epoch in a single dispatch.  Batch arrays are stacked
        (num_batches, batch); returns (state, metrics-of-arrays)."""
        cfg = self.config
        e = P(None, "data")
        args = [self._put(np.asarray(lab_idx), e),
                self._put(np.asarray(lab_y), e),
                self._put(np.asarray(unl_idx), e)]
        pool = []
        if cfg.gather_impl == "pool":
            p, li_p, ui_p = self._poolify(lab_idx, unl_idx)
            pool = [self._put(p, P())]
            args[0] = self._put(li_p, e)
            args[2] = self._put(ui_p, e)
        return self._epoch_fn(
            state, self._put(scene.padded_pca, P()),
            self._put(scene.spectra, P()), *pool, *args,
            self._put(np.float32(self._adaptive_thr(epoch)), P()),
            self._put(np.asarray(epoch > 0), P()), scene.cols)

    def train_run(self, state, scene: PreparedScene, sampler):
        """The whole training schedule (num_epochs x batches) in ONE
        dispatch.  Pre-draws every epoch's shuffled index arrays from the
        sampler (same host-rng sequence as fit()'s per-epoch path) and
        scans over them on device; returns (state, metrics stacked
        (E, N))."""
        cfg = self.config
        li, ly, ui = stack_schedule(sampler, cfg.num_epochs)
        adap = np.asarray([self._adaptive_thr(e)
                           for e in range(cfg.num_epochs)], np.float32)
        r = P(None, None, "data")
        args = [self._put(li, r), self._put(ly, r), self._put(ui, r)]
        pool = []
        if cfg.gather_impl == "pool":
            p, li_p, ui_p = self._poolify(li, ui)
            pool = [self._put(p, P())]
            args[0] = self._put(li_p, r)
            args[2] = self._put(ui_p, r)
        return self._run_fn(
            state, self._put(scene.padded_pca, P()),
            self._put(scene.spectra, P()), *pool, *args,
            self._put(adap, P()), scene.cols)

    # -- EpochDriver adapters: thread the epoch through for the adaptive
    # threshold + queue warmup (train.py:147-148,220-228) ---------------- #
    def _fit_epoch(self, state, scene, li, ly, ui, epoch: int):
        return self.train_epoch(state, scene, li, ly, ui, epoch)

    def _fit_step(self, state, scene, li, ly, ui, epoch: int,
                  batch_index: int):
        return self.train_step(state, scene, li, ly, ui, epoch, batch_index)

    def _format_log(self, epoch, batch_index, num_batches, m):
        cfg = self.config
        return (f"Epoch {epoch + 1}/{cfg.num_epochs}: "
                f"{batch_index + 1}/{num_batches} "
                f"loss_contrast={m['loss_contrast']:.2f} "
                f"total_loss={m['total_loss']:.4f} "
                f"cls_loss={m['cls_loss']:.4f} "
                f"con_loss={m['con_loss']:.4f} "
                f"acc={m['acc'] * 100:.2f}")
