"""Generic supervised trainer for any zoo backbone.

The reference has no backbone-training script in-repo (the zoo at
``tools/conpared_models.py`` holds the paper's comparison models); this
trainer supplies the capability: supervised CE over the labeled split, with
optional patch augmentations, BatchNorm state handling, and full-scene
evaluation through the same :class:`~cmlpl_tpu.eval.inference.ScenePredictor`
(the ``base_test_whole`` path, hyper_tools.py:439-460).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmlpl_tpu.data.augment import radiation_noise, random_flip, random_rot90
from cmlpl_tpu.data.patches import gather_spectra
from cmlpl_tpu.data.prep import PreparedScene
from cmlpl_tpu.objectives.supervised import cross_entropy


class SupervisedState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    rng: jax.Array
    step: jax.Array
    # EMA-teacher copy {"params", "batch_stats"} when ema_alpha > 0
    # (reference WeightEMA_BN, tools/models.py:155-164 — defined but dead
    # there; invocable here via --ema_teacher); () when disabled
    ema: Any = ()


class SupervisedTrainer:
    """CE training of one backbone on the labeled split."""

    def __init__(self, model, entry, *, lr: float = 5e-4,
                 patch_size: int, n_pc: int, num_features: int,
                 mesh: Optional[Mesh] = None, augment: bool = False,
                 donate: bool = True, gather_impl: str = "auto",
                 ema_alpha: float = 0.0):
        self.model = model
        self.entry = entry            # ZooEntry: inputs/returns_feature
        self.patch_size = patch_size
        self.n_pc = n_pc
        self.num_features = num_features
        self.mesh = mesh
        self.augment = augment
        from cmlpl_tpu.ops.patch_gather import (
            check_gather_mesh,
            resolve_gather_impl,
        )

        # labeled-only epochs have no pre-gathered-pool path (the whole
        # labeled set is ~45 pixels); "auto" resolves to the plain gather
        self.gather_impl = gather_impl = resolve_gather_impl(
            gather_impl, num_unlabel=0, patch_size=patch_size, n_pc=n_pc,
            pool_supported=False)
        self.ema_alpha = float(ema_alpha)
        check_gather_mesh(gather_impl, mesh)
        from cmlpl_tpu.core.mesh import is_multiprocess

        self._multiproc = is_multiprocess(mesh)
        self._donate = (0,) if donate else ()
        self.optimizer = optax.adam(lr)
        self._state_sh = self._state_sharding_tree()
        self._step_fn, self._run_fn = self._build_step()

    # -- model plumbing -------------------------------------------------- #
    def _apply(self, variables, xp, x, *, train, rngs=None, mutable=False):
        if self.entry.inputs == "dual":
            return self.model.apply(variables, xp, x, train=train,
                                    rngs=rngs, mutable=mutable)
        return self.model.apply(variables, xp, train=train, rngs=rngs,
                                mutable=mutable)

    def logits_fn(self):
        """(params_and_stats, xp, x) -> logits, for ScenePredictor."""

        def fn(variables, xp, x):
            out = self._apply(variables, xp, x, train=False)
            if self.entry.returns_feature:
                return out[0]
            return out

        return fn

    def _make_state(self, rng: jax.Array) -> SupervisedState:
        k_init, k_run = jax.random.split(rng)
        xp = jnp.zeros((2, self.patch_size, self.patch_size, self.n_pc))
        x = jnp.zeros((2, self.num_features))
        variables = (self.model.init(k_init, xp, x, train=False)
                     if self.entry.inputs == "dual"
                     else self.model.init(k_init, xp, train=False))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # the teacher starts as a COPY (aliasing the student's buffers
        # would make state donation hand the same buffer over twice)
        ema = (jax.tree_util.tree_map(
                   jnp.copy, {"params": params, "batch_stats": batch_stats})
               if self.ema_alpha > 0 else ())
        return SupervisedState(
            params=params, batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            rng=k_run, step=jnp.zeros((), jnp.int32), ema=ema)

    def _state_sharding_tree(self):
        """dp + opt-in dp x tp: the BaseNet2 TP path rules
        (core.mesh.basenet_tp_shardings) applied to params / Adam moments
        / the EMA copy — they key on leaf paths, so backbones without a
        feat_spe simply stay fully replicated on the model axis."""
        mesh = self.mesh
        if mesh is None:
            return None
        from cmlpl_tpu.core.mesh import basenet_tp_shardings

        repl = NamedSharding(mesh, P())
        template = jax.eval_shape(self._make_state, jax.random.key(0))
        return SupervisedState(
            params=basenet_tp_shardings(mesh, template.params),
            batch_stats=jax.tree_util.tree_map(lambda _: repl,
                                               template.batch_stats),
            opt_state=basenet_tp_shardings(mesh, template.opt_state),
            rng=repl, step=repl,
            ema=basenet_tp_shardings(mesh, template.ema))

    def init_state(self, rng: jax.Array) -> SupervisedState:
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

    # -- the fused step --------------------------------------------------#
    def _build_step(self):
        augment = self.augment

        from cmlpl_tpu.ops.patch_gather import make_train_gather

        prep_cube, gather_xp = make_train_gather(self.gather_impl,
                                                 self.n_pc)

        def step(state: SupervisedState, padded, spectra, lab_idx, lab_y,
                 cols: int) -> Tuple[SupervisedState, dict]:
            rng, k_aug1, k_aug2, k_aug3, k_drop = jax.random.split(
                state.rng, 5)
            xp = gather_xp(padded, lab_idx, cols, self.patch_size)
            x = gather_spectra(spectra, lab_idx)
            if augment:
                xp = random_flip(k_aug1, xp)
                xp = random_rot90(k_aug2, xp)
                xp = radiation_noise(k_aug3, xp)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    out, updates = self._apply(
                        variables, xp, x, train=True,
                        rngs={"dropout": k_drop},
                        mutable=["batch_stats"])
                    new_stats = updates["batch_stats"]
                else:
                    out = self._apply(variables, xp, x, train=True,
                                      rngs={"dropout": k_drop})
                    new_stats = state.batch_stats
                logits = out[0] if self.entry.returns_feature else out
                loss = cross_entropy(logits, lab_y)
                acc = jnp.mean(
                    (jnp.argmax(logits, 1) == lab_y).astype(jnp.float32))
                return loss, (new_stats, {"cls_loss": loss, "acc": acc})

            grads, (new_stats, metrics) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            upd, opt_state = self.optimizer.update(grads, state.opt_state)
            new_params = optax.apply_updates(state.params, upd)
            ema = state.ema
            if self.ema_alpha > 0:
                # E = B*(1-a) + E*a over params AND BN buffers, from the
                # post-update student (reference WeightEMA_BN semantics,
                # tools/models.py:155-164)
                from cmlpl_tpu.models.zoo import weight_ema

                ema = weight_ema(
                    {"params": new_params, "batch_stats": new_stats},
                    state.ema, self.ema_alpha)
            return SupervisedState(
                params=new_params,
                batch_stats=new_stats, opt_state=opt_state,
                rng=rng, step=state.step + 1, ema=ema), metrics

        def run_fn(state, padded, spectra, lab_idx, lab_y, cols: int):
            """All steps of the whole schedule as one lax.scan dispatch
            (batch arrays stacked (T, B))."""

            def body(carry, inputs):
                li, ly = inputs
                return step(carry, padded, spectra, li, ly, cols)

            return jax.lax.scan(body, state, (lab_idx, lab_y))

        def step_entry(state, padded, *rest):
            return step(state, prep_cube(padded), *rest)

        def run_entry(state, padded, *rest):
            return run_fn(state, prep_cube(padded), *rest)

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            batch_sh = NamedSharding(self.mesh, P("data"))
            run_sh = NamedSharding(self.mesh, P(None, "data"))
            state_sh = self._state_sh
            return (jax.jit(step_entry, static_argnums=(5,),
                            in_shardings=(state_sh, repl, repl, batch_sh,
                                          batch_sh),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate),
                    jax.jit(run_entry, static_argnums=(5,),
                            in_shardings=(state_sh, repl, repl, run_sh,
                                          run_sh),
                            out_shardings=(state_sh, repl),
                            donate_argnums=self._donate))
        return (jax.jit(step_entry, static_argnums=(5,),
                        donate_argnums=self._donate),
                jax.jit(run_entry, static_argnums=(5,),
                        donate_argnums=self._donate))

    def train_step(self, state, scene: PreparedScene, lab_idx, lab_y):
        b = P("data")
        return self._step_fn(state, self._put(scene.padded_pca, P()),
                             self._put(scene.spectra, P()),
                             self._put(lab_idx, b), self._put(lab_y, b),
                             scene.cols)

    def train_run(self, state, scene: PreparedScene, lab_idx, lab_y):
        """All steps (stacked (T, B) index/label arrays) in one dispatch."""
        r = P(None, "data")
        return self._run_fn(state, self._put(scene.padded_pca, P()),
                            self._put(scene.spectra, P()),
                            self._put(lab_idx, r), self._put(lab_y, r),
                            scene.cols)

    def _schedule(self, train_idx, labels, batch_size, num_epochs,
                  epoch_samples, seed):
        """Pre-draw every epoch's shuffled batches -> (T, B) arrays.

        The batch size is rounded to a multiple of the mesh's data-axis
        size (tiling the split if it is smaller — e.g. 45 labels on an
        8-chip mesh) so every step shards evenly.
        """
        rng = np.random.default_rng(seed)
        idx = np.asarray(train_idx)
        d = 1
        if self.mesh is not None:
            d = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape)).get("data", 1)
        all_li, all_ly = [], []
        for _ in range(num_epochs):
            perm = rng.permutation(idx)
            if epoch_samples:
                reps = -(-epoch_samples // len(perm))
                perm = np.tile(perm, reps)[:epoch_samples]
            bs = min(batch_size, len(perm))
            bs = max((bs // d) * d, d)
            if len(perm) < bs:
                perm = np.tile(perm, -(-bs // len(perm)))[:bs]
            n_batches = max(len(perm) // bs, 1)
            for b in range(n_batches):
                li = perm[b * bs:(b + 1) * bs]
                if len(li) < bs:
                    break
                all_li.append(li.astype(np.int32))
                all_ly.append((labels[li] - 1).astype(np.int32))
        return np.stack(all_li), np.stack(all_ly)

    def steps_per_epoch(self, n_train: int, batch_size: int,
                        epoch_samples: Optional[int] = None) -> int:
        """Batches per epoch under ``_schedule``'s rounding (for resume
        bookkeeping: epoch = state.step // steps_per_epoch)."""
        d = 1
        if self.mesh is not None:
            d = dict(zip(self.mesh.axis_names,
                         self.mesh.devices.shape)).get("data", 1)
        n = epoch_samples if epoch_samples else n_train
        bs = min(batch_size, n)
        bs = max((bs // d) * d, d)
        n = max(n, bs)
        return max(n // bs, 1)

    def fit(self, state, scene: PreparedScene, train_idx: np.ndarray,
            labels: np.ndarray, *, batch_size: int = 128,
            num_epochs: int = 100, epoch_samples: Optional[int] = None,
            seed: int = 1088, log_every: int = 10, log_fn=print,
            scan_run: bool = True, start_epoch: int = 0,
            on_epoch_end=None):
        """Epoch driver over the labeled split (tiled like the reference's
        max_iters loaders when epoch_samples is given).  ``scan_run``
        fuses the whole schedule into one dispatch; ``start_epoch``
        supports resume, ``on_epoch_end(epoch, state)`` hooks periodic
        checkpointing (per-epoch dispatches when either is used)."""
        li, ly = self._schedule(train_idx, labels, batch_size, num_epochs,
                                epoch_samples, seed)
        if scan_run and (start_epoch > 0 or on_epoch_end is not None):
            per_epoch = li.shape[0] // num_epochs
            history = []
            for epoch in range(start_epoch, num_epochs):
                sl = slice(epoch * per_epoch, (epoch + 1) * per_epoch)
                state, stacked = self.train_run(state, scene, li[sl],
                                                ly[sl])
                stacked = jax.device_get(stacked)
                history.extend({k: v[i] for k, v in stacked.items()}
                               for i in range(per_epoch))
                if log_every and (epoch + 1) % log_every == 0:
                    m = history[-1]
                    log_fn(f"Epoch {epoch + 1}/{num_epochs} "
                           f"cls_loss={float(m['cls_loss']):.4f} "
                           f"acc={float(m['acc']) * 100:.2f}")
                if on_epoch_end is not None:
                    on_epoch_end(epoch, state)
            return state, history
        if scan_run:
            state, stacked = self.train_run(state, scene, li, ly)
            stacked = jax.device_get(stacked)
            t = li.shape[0]
            history = [{k: v[i] for k, v in stacked.items()}
                       for i in range(t)]
            if log_every:
                per_epoch = max(t // num_epochs, 1)
                for epoch in range(log_every - 1, num_epochs, log_every):
                    i = min((epoch + 1) * per_epoch, t) - 1
                    m = history[i]
                    log_fn(f"Epoch {epoch + 1}/{num_epochs} "
                           f"cls_loss={float(m['cls_loss']):.4f} "
                           f"acc={float(m['acc']) * 100:.2f}")
            return state, history
        history = []
        for i in range(li.shape[0]):
            state, metrics = self.train_step(state, scene, li[i], ly[i])
            history.append(metrics)
            if log_every and (i + 1) % log_every == 0:
                m = jax.device_get(metrics)
                log_fn(f"step {i + 1}/{li.shape[0]} "
                       f"cls_loss={float(m['cls_loss']):.4f} "
                       f"acc={float(m['acc']) * 100:.2f}")
        return state, history

    def eval_variables(self, state: SupervisedState, ema: bool = False):
        """Inference variables; ``ema=True`` selects the EMA-teacher copy
        (requires ema_alpha > 0 at construction)."""
        if ema:
            if not state.ema:
                raise ValueError("no EMA teacher in this state; construct "
                                 "the trainer with ema_alpha > 0")
            src = state.ema
            variables = {"params": src["params"]}
            if src["batch_stats"]:
                variables["batch_stats"] = src["batch_stats"]
            return variables
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return variables
