"""CCT trainer — Cross-Consistency Training baseline
(reference ``trian_CCT.py``).

One CCT_Net encoder + three linear decoder heads (trian_CCT.py:143-151).
Unlabeled features get two Gaussian feature-space perturbations
(trian_CCT.py:205-206); a 4-way symmetric JS consistency ties the perturbed
decoders to the clean decoder (trian_CCT.py:211-215).

The reference runs one backward and then steps *two* Adam optimizers with
overlapping encoder parameters (trian_CCT.py:161-162, :221-223) — the
encoder receives two Adam updates from the same gradients with separate
moment state.  Reproduced exactly: two optax.adam states over the
(encoder, decoder_base) and (encoder, decoder1, decoder2) subsets; both
encoder updates are applied (they add — Adam's update depends only on the
gradient moments, not the current value).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmlpl_tpu.data.patches import gather_spectra
from cmlpl_tpu.data.prep import PreparedScene
from cmlpl_tpu.models.basenet import CCTNet, LinearClassifier
from cmlpl_tpu.objectives.cct import softmax_js_loss
from cmlpl_tpu.objectives.supervised import cross_entropy
from cmlpl_tpu.train.driver import EpochDriver, stack_schedule
from cmlpl_tpu.train.state import CMLPLConfig


class CCTTrainState(NamedTuple):
    params: dict          # {"encoder", "dec_base", "dec1", "dec2"}
    opt_base: optax.OptState   # over (encoder, dec_base)
    opt_aug: optax.OptState    # over (encoder, dec1, dec2)
    rng: jax.Array
    step: jax.Array


class CCTTrainer(EpochDriver):
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
        self.encoder = CCTNet(
            num_features=config.num_features, dropout=config.dropout,
            num_classes=config.num_classes, n_pc=config.n_pc,
            dtype=(jnp.bfloat16 if config.compute_dtype == "bfloat16"
                   else None))
        joint = 64 * (config.patch_size // 4) ** 2 + 1024
        self.head = LinearClassifier(config.num_classes, in_features=joint)
        self.opt_base = optax.adam(config.lr)
        self.opt_aug = optax.adam(config.lr)
        self._state_sh = self._state_sharding_tree()
        self._step_fn, self._epoch_fn, self._run_fn = \
            self._build_step()

    def _make_state(self, rng: jax.Array) -> CCTTrainState:
        cfg = self.config
        ks = jax.random.split(rng, 5)
        xp = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.n_pc))
        x = jnp.zeros((1, cfg.num_features))
        enc = self.encoder.init(ks[0], xp, x, train=False)["params"]
        fea = jnp.zeros((1, self.head.in_features))
        params = {
            "encoder": enc,
            "dec_base": self.head.init(ks[1], fea)["params"],
            "dec1": self.head.init(ks[2], fea)["params"],
            "dec2": self.head.init(ks[3], fea)["params"],
        }
        return CCTTrainState(
            params=params,
            opt_base=self.opt_base.init(
                {"encoder": params["encoder"],
                 "dec_base": params["dec_base"]}),
            opt_aug=self.opt_aug.init(
                {"encoder": params["encoder"], "dec1": params["dec1"],
                 "dec2": params["dec2"]}),
            rng=ks[4], step=jnp.zeros((), jnp.int32))

    def _state_sharding_tree(self):
        """Encoder gets the BaseNet2 TP rules (its feat_spe/classifier
        live under params["encoder"]; core.mesh.basenet_tp_shardings keys
        on leaf paths, so applying the rules to the whole params and both
        overlapping opt-state trees shards exactly the encoder's wide
        spectral path); the three linear decoder heads stay replicated."""
        mesh = self.mesh
        if mesh is None:
            return None
        from cmlpl_tpu.core.mesh import basenet_tp_shardings

        repl = NamedSharding(mesh, P())
        template = jax.eval_shape(self._make_state, jax.random.key(0))
        return CCTTrainState(
            params=basenet_tp_shardings(mesh, template.params),
            opt_base=basenet_tp_shardings(mesh, template.opt_base),
            opt_aug=basenet_tp_shardings(mesh, template.opt_aug),
            rng=repl, step=repl)

    def init_state(self, rng: jax.Array) -> CCTTrainState:
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
        encoder = self.encoder
        head = self.head

        from cmlpl_tpu.ops.patch_gather import (
            make_input_cast,
            make_train_gather,
        )

        # input/view dtype at the dispatch boundary (state.py input_dtype);
        # the feature-space perturbations stay f32 (fea1 is promoted)
        in_cast = make_input_cast(cfg.compute_dtype, cfg.input_dtype)
        from cmlpl_tpu.ops.noise import make_noiser

        noisy = make_noiser(cfg.noise_impl, cfg.noise)

        pool_mode = cfg.gather_impl == "pool"
        if pool_mode:
            # pre-gathered-pool gather (train/cmlpl.py; +22.6% there)
            _, bulk_gather = make_train_gather("xla", cfg.n_pc)

            def prep_cube(padded):
                return padded

            def gather_xp(pooled, pos, cols, w):
                return jnp.take(pooled, pos, axis=0)
        else:
            prep_cube, gather_xp = make_train_gather(cfg.gather_impl,
                                                     cfg.n_pc)

        def step(state: CCTTrainState, padded, spectra, lab_idx, lab_y,
                 unl_idx, cols: int) -> Tuple[CCTTrainState, dict]:
            w = cfg.patch_size
            bt = lab_idx.shape[0]
            rng, k_noise, k_drop = jax.random.split(state.rng, 3)

            xp_l = in_cast(gather_xp(padded, lab_idx, cols, w))
            x_l = in_cast(gather_spectra(spectra, lab_idx))
            xp_u = in_cast(gather_xp(padded, unl_idx, cols, w))
            x_u = in_cast(gather_spectra(spectra, unl_idx))

            # trian_CCT.py:179-197: noisy labeled inputs, noisy unlabeled
            if cfg.noise_fused:
                nk = jax.random.split(k_noise, 4)
                xp_all = noisy(nk[0], jnp.concatenate([xp_l, xp_u],
                                                      axis=0))
                x_all = noisy(nk[1], jnp.concatenate([x_l, x_u], axis=0))
                k_fea1, k_fea2 = nk[2], nk[3]
            else:
                nk = jax.random.split(k_noise, 6)
                xp_all = jnp.concatenate([noisy(nk[0], xp_l),
                                          noisy(nk[1], xp_u)], axis=0)
                x_all = jnp.concatenate([noisy(nk[2], x_l),
                                         noisy(nk[3], x_u)], axis=0)
                k_fea1, k_fea2 = nk[4], nk[5]

            def loss_fn(params):
                fea_all, _ = encoder.apply(
                    {"params": params["encoder"]}, xp_all, x_all,
                    train=True, rngs={"dropout": k_drop})
                fea_lab, fea_un = fea_all[:bt], fea_all[bt:]

                lab_out = head.apply({"params": params["dec_base"]}, fea_lab)
                cls = cross_entropy(lab_out, lab_y)

                # feature-space perturbations (trian_CCT.py:205-206)
                fea_aug1 = noisy(k_fea1, fea_un)
                fea_aug2 = noisy(k_fea2, fea_un)
                origin_out = head.apply({"params": params["dec_base"]},
                                        fea_un)
                aug_out1 = head.apply({"params": params["dec1"]}, fea_aug1)
                aug_out2 = head.apply({"params": params["dec2"]}, fea_aug2)

                ori_t = jax.nn.softmax(jax.lax.stop_gradient(origin_out), 1)
                t1 = jax.nn.softmax(jax.lax.stop_gradient(aug_out1), 1)
                t2 = jax.nn.softmax(jax.lax.stop_gradient(aug_out2), 1)

                total = (cls
                         + softmax_js_loss(origin_out, t1)
                         + softmax_js_loss(origin_out, t2)
                         + softmax_js_loss(aug_out1, ori_t)
                         + softmax_js_loss(aug_out2, ori_t))
                acc = jnp.mean((jnp.argmax(lab_out, 1) == lab_y)
                               .astype(jnp.float32))
                return total, {"total_loss": total, "cls_loss": cls,
                               "acc": acc}

            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)

            g_base = {"encoder": grads["encoder"],
                      "dec_base": grads["dec_base"]}
            g_aug = {"encoder": grads["encoder"], "dec1": grads["dec1"],
                     "dec2": grads["dec2"]}
            upd_base, opt_base = self.opt_base.update(g_base, state.opt_base)
            upd_aug, opt_aug = self.opt_aug.update(g_aug, state.opt_aug)

            p = state.params
            enc = optax.apply_updates(p["encoder"], upd_base["encoder"])
            enc = optax.apply_updates(enc, upd_aug["encoder"])
            new_params = {
                "encoder": enc,
                "dec_base": optax.apply_updates(p["dec_base"],
                                                upd_base["dec_base"]),
                "dec1": optax.apply_updates(p["dec1"], upd_aug["dec1"]),
                "dec2": optax.apply_updates(p["dec2"], upd_aug["dec2"]),
            }
            return CCTTrainState(new_params, opt_base, opt_aug, rng,
                                 state.step + 1), metrics

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

        # cube transform for the configured gather, applied exactly once
        # at the dispatch boundary (NOT idempotent; see train/cps.py);
        # pool mode takes (P,) pool_idx and feeds the cores pooled
        # tensors + positions
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
        """(maybe-pool, li, ly, ui) jit inputs (see train/cps.py)."""
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
                f"acc={m['acc'] * 100:.2f}")
