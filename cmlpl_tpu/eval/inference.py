"""Full-scene inference — the reference's "serve" path, TPU-native.

The reference's ``test_whole`` (hyper_tools.py:416-437) loops 406 batches
with a host round-trip and an O(n^2) ``np.append`` per batch.  Here the
entire scene is classified in **one jit call**: pixel indices are tiled,
``lax.map`` scans the tiles (bounding VMEM/HBM working set), each tile
gathers its patches from the HBM-resident padded cube, runs the forward
pass and argmaxes on device; one final (K,) int32 transfer returns the map.

The patch gather is the Pallas DMA kernel on TPU (4x the effective
bandwidth of the XLA gather HLO; see ops/patch_gather.py) and the XLA
gather elsewhere.

Multi-chip: the tile dimension is sharded over the mesh's ``data`` axis, so
each chip classifies an interleaved strip of the scene (the Houston scene's
664,845 pixels are the scale axis here — see SURVEY §5).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cmlpl_tpu.data.prep import PreparedScene


def _resolve_gather(gather: str) -> str:
    if gather != "auto":
        return gather
    return ("pallas" if jax.default_backend() in ("tpu", "axon")
            else "xla")


_DENSE_KEYS = ("conv0", "conv1", "conv2", "feat_spe", "classifier")


def _dense_params_view(params):
    """Canonical BaseNet2-shaped view of a param tree for the dense pass.

    Accepts BaseNet2 params directly, or a CCT train-state tree
    (``{"encoder": stem, "dec_base": {"fc": head}, ...}``): the CCT eval
    path is ``head(encoder(xp, x))`` (trian_CCT.py:246 ->
    hyper_tools.py:462-484) and CCTNet's stem + (H, W, C) flatten order
    are identical to BaseNet2's (models.py:229-287 vs :97-152), so the
    dense dilated transform applies unchanged with the linear head in
    the classifier slot.  Raises ValueError for any other shape (zoo
    backbones use the tiled gather modes).
    """
    if "encoder" in params and "dec_base" in params:
        params = dict(params["encoder"],
                      classifier=params["dec_base"]["fc"])
    missing = [k for k in _DENSE_KEYS if k not in params]
    if missing:
        raise ValueError(
            "dense eval requires BaseNet2/CCT-shaped params; missing "
            f"{missing} (use the tiled gather modes for other backbones)")
    return {k: params[k] for k in _DENSE_KEYS}


def dense_scene_logits(params, scene: PreparedScene) -> jax.Array:
    """Full-scene BaseNet2 logits as ONE dense dilated-conv evaluation
    (the OverFeat/à-trous transform) — no patch gather at all.

    The patch evaluator repeats conv work ~w^2 times across overlapping
    windows; here the conv stack runs once over the padded cube with the
    two stride-2 pools turned into stride-1 pools + kernel dilations
    (conv2 at dilation 2, second pool at window dilation 2), and each
    pixel's (w/4)^2 x 64 spatial flatten becomes 25 shifted views of the
    pooled map folded directly into the classifier matmul.  ~370x less
    conv FLOPs for PaviaU.

    Boundary semantics intentionally differ from the reference's patch
    evaluator (hyper_tools.py:416-437): a 20x20 patch zero-pads ITS OWN
    edges inside conv1/conv2 (models.py:104-111), while the dense pass
    sees the true neighbouring pixels.  That zero-padded halo sits at
    distance w/2 from EVERY pixel's centre — inside every classifier
    receptive field — so disagreements are border-concentrated but NOT
    border-confined: measured on trained nets at 48x40 versions of all
    four geometries, 2.2-2.9% of pixels disagree, ~67-88% of them within
    w/2 of the scene border and the rest interior.  Conv pad placement
    is the ONLY divergence source: with conv1/conv2 restricted to their
    centre tap (padding can influence nothing) dense logits equal true
    patch logits everywhere
    (tests/test_eval.py::test_dense_disagreement_is_conv_pad_semantics_only).
    Whole-scene numbers on a trained net: 99.6% prediction agreement,
    0.9998 logit correlation, OA within 0.1 (tests/test_eval.py) —
    opt-in via ``--eval_gather dense``.

    Requires a BaseNet2-family or CCT param tree (see
    :func:`_dense_params_view`) and ``patch_size % 4 == 0``.
    """
    import jax.numpy as jnp

    if scene.patch_size % 4 != 0:
        raise ValueError("dense eval needs patch_size % 4 == 0 "
                         f"(got {scene.patch_size})")
    return _dense_logits(_dense_params_view(params), scene.padded_pca,
                         scene.spectra, scene.rows, scene.cols,
                         scene.patch_size)


def _dense_logits(params, padded, spectra, rows: int, cols: int,
                  patch_size: int) -> jax.Array:
    import jax.numpy as jnp

    cube = jnp.asarray(padded, jnp.float32)[None]
    g = patch_size // 4

    def conv(x, p, dil=1, pad=0):
        out = lax.conv_general_dilated(
            x, p["kernel"], (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + p["bias"]

    f0 = conv(cube, params["conv0"])
    f1 = jax.nn.relu(conv(f0, params["conv1"], pad=1) + f0)
    p1 = lax.reduce_window(f1, 0.0, lax.add, (1, 2, 2, 1), (1, 1, 1, 1),
                           "VALID") / 4
    f2 = jax.nn.relu(conv(p1, params["conv2"], dil=2, pad=2) + p1)
    p2 = lax.reduce_window(f2, 0.0, lax.add, (1, 2, 2, 1), (1, 1, 1, 1),
                           "VALID", window_dilation=(1, 2, 2, 1))[0] / 4

    wk = params["classifier"]["kernel"]
    logits_sp = jnp.zeros((rows, cols, wk.shape[1]), jnp.float32)
    for a in range(g):          # (H, W, C) flatten order of the 5x5x64
        for b in range(g):
            blk = wk[(a * g + b) * 64:(a * g + b + 1) * 64]
            logits_sp = logits_sp + (
                p2[4 * a:4 * a + rows, 4 * b:4 * b + cols] @ blk)
    y = jax.nn.relu(jnp.asarray(spectra)
                    @ params["feat_spe"]["kernel"]
                    + params["feat_spe"]["bias"])
    logits_spec = y @ wk[64 * g * g:]
    return (logits_sp.reshape(rows * cols, -1) + logits_spec
            + params["classifier"]["bias"])


class ScenePredictor:
    """Classifies every pixel of a prepared scene.

    ``apply_fn(params, xp, x) -> logits`` abstracts the model so the same
    predictor serves BaseNet2 (logits head), CCT (encoder + linear head)
    and the zoo backbones.

    ``gather``: "pallas" (TPU DMA kernel), "pallas_bf16" (DMA from the
    8-column-shift bf16 cube — half the gather bytes; patch INPUTS are
    bf16-quantised then upcast, so boundary pixels can flip class vs f32),
    "xla", or "auto" (pallas on TPU).  The pallas paths transform the cube
    once per call and slice back after the gather.
    """

    def __init__(self, apply_fn: Callable, *, patch_size: int, cols: int,
                 tile: int = 4096, mesh: Optional[Mesh] = None,
                 gather: str = "auto"):
        self.apply_fn = apply_fn
        self.patch_size = patch_size
        self.cols = cols
        self.tile = tile
        self.mesh = mesh
        self.gather = _resolve_gather(gather)
        self._predicts: dict = {}

    def _gather_mode(self, cube_channels: int) -> str:
        """Per-scene gather resolution.  Mosaic's memref_slice requires
        8-aligned column slices once the cube spans MORE than one
        128-lane tile ("Slice shape along dimension 1 must be aligned to
        tiling (8)") — scenes/models with >128 channels (e.g. raw
        200-band Indian Pines through the 3-D-conv zoo models) therefore
        fall back to the XLA gather rather than crash; <=128-channel
        cubes (every n_PC<=128 config) keep the measured-faster Pallas
        DMA paths."""
        if self.gather in ("pallas", "pallas_bf16") and cube_channels > 128:
            return "xla"
        return self.gather

    def _build(self, mode: str):
        w = self.patch_size
        cols = self.cols
        apply_fn = self.apply_fn
        use_pallas = mode == "pallas"

        use_shifted = mode == "pallas_bf16"

        def predict(params, padded, spectra, idx_tiles, n_pc):
            def gather_tile(idx):
                if use_shifted:
                    from cmlpl_tpu.ops.patch_gather import (
                        gather_patches_pallas_shifted)

                    interp = jax.default_backend() not in ("tpu", "axon")
                    xp = gather_patches_pallas_shifted(
                        padded, idx, cols=cols, w=w, interpret=interp)
                    return xp[..., :n_pc].astype(jnp.float32)
                if use_pallas:
                    from cmlpl_tpu.ops.patch_gather import (
                        gather_patches_pallas)

                    interp = jax.default_backend() not in ("tpu", "axon")
                    xp = gather_patches_pallas(padded, idx, cols=cols, w=w,
                                               interpret=interp)
                    return xp[..., :n_pc]
                r = idx // cols
                c = idx % cols

                def slice_one(ri, ci):
                    return lax.dynamic_slice(
                        padded, (ri, ci, 0), (w, w, padded.shape[-1]))

                return jax.vmap(slice_one)(r, c)[..., :n_pc]

            def one_tile(idx):
                xp = gather_tile(idx)
                x = jnp.take(spectra, idx, axis=0)
                logits = apply_fn(params, xp, x)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            return lax.map(one_tile, idx_tiles)

        static = ("n_pc",)
        if self.mesh is not None:
            # shard_map over the tiles dim: each chip runs the whole
            # gather+forward pipeline (including pallas_call, which GSPMD
            # can't partition) on its own strip of the scene
            shard_map = jax.shard_map

            mesh = self.mesh
            axis = mesh.axis_names[0]

            def predict_sharded(params, padded, spectra, idx_tiles, n_pc):
                local = shard_map(
                    lambda p, pad, sp, tiles: predict(p, pad, sp, tiles,
                                                      n_pc),
                    mesh=mesh,
                    in_specs=(P(), P(), P(), P(axis, None)),
                    out_specs=P(axis, None),
                    check_vma=False,
                )
                return local(params, padded, spectra, idx_tiles)

            return jax.jit(predict_sharded, static_argnames=static)
        return jax.jit(predict, static_argnames=static)

    def __call__(self, params, scene: PreparedScene) -> np.ndarray:
        """Returns 0-based predicted class ids for all rows*cols pixels.

        On a multi-process (pod) mesh each host classifies its own strip
        of the tile grid and the strips are allgathered back to every
        host — scene-scale work splits across the pod instead of being
        duplicated per host."""
        k = scene.num_pixels
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        per_tile = self.tile
        padded_k = -(-k // (per_tile * n_dev)) * (per_tile * n_dev)
        idx = np.arange(padded_k, dtype=np.int32)
        idx[k:] = 0  # padding pixels classify pixel 0; discarded below
        idx_tiles = idx.reshape(-1, per_tile)

        if self.gather == "dense":
            # dense dilated whole-scene evaluation: no tiles, no gather.
            # Pure XLA, so unlike the Pallas modes it partitions over the
            # mesh with GSPMD: the padded cube's ROW dim and the
            # spectra's pixel dim are sharded over the first mesh axis
            # and XLA inserts the conv halo exchanges + the reshard for
            # the shifted-view classifier folds; predictions come back
            # replicated (fetchable on every pod host).
            from cmlpl_tpu.core.mesh import host_to_global, is_multiprocess

            if scene.patch_size % 4 != 0:
                raise ValueError("dense eval needs patch_size % 4 == 0 "
                                 f"(got {scene.patch_size})")
            view = _dense_params_view(params)

            def dense_fn(p, padded, spectra, rows, cols, w):
                return jnp.argmax(
                    _dense_logits(p, padded, spectra, rows, cols, w),
                    -1).astype(jnp.int32)

            if self.mesh is not None:
                axis = self.mesh.axis_names[0]
                cube_sh = jax.sharding.NamedSharding(
                    self.mesh, P(axis, None, None))
                sp_sh = jax.sharding.NamedSharding(self.mesh,
                                                   P(axis, None))
                repl = jax.sharding.NamedSharding(self.mesh, P())
                if "dense_sharded" not in self._predicts:
                    # inputs arrive replicated (scene dims are rarely
                    # divisible by the device count, and jax.Array
                    # formation refuses uneven shards); the constraints
                    # inside the jit hand GSPMD the partitioning, which
                    # pads uneven row counts internally
                    def dense_sharded(p, padded, spectra, rows, cols, w):
                        padded = jax.lax.with_sharding_constraint(
                            padded, cube_sh)
                        spectra = jax.lax.with_sharding_constraint(
                            spectra, sp_sh)
                        return dense_fn(p, padded, spectra, rows, cols, w)

                    self._predicts["dense_sharded"] = jax.jit(
                        dense_sharded, static_argnums=(3, 4, 5),
                        in_shardings=(repl, repl, repl),
                        out_shardings=repl)
                cube, spectra = scene.padded_pca, scene.spectra
                if is_multiprocess(self.mesh):
                    view = jax.tree_util.tree_map(
                        lambda a: host_to_global(repl, jax.device_get(a)),
                        view)
                    cube = host_to_global(repl, jax.device_get(cube))
                    spectra = host_to_global(repl, jax.device_get(spectra))
                preds = self._predicts["dense_sharded"](
                    view, cube, spectra, scene.rows, scene.cols,
                    scene.patch_size)
                return np.asarray(jax.device_get(preds)).reshape(-1)

            if "dense" not in self._predicts:
                self._predicts["dense"] = jax.jit(
                    dense_fn, static_argnums=(3, 4, 5))
            preds = self._predicts["dense"](
                view, scene.padded_pca, scene.spectra, scene.rows,
                scene.cols, scene.patch_size)
            return np.asarray(jax.device_get(preds)).reshape(-1)

        cube = scene.padded_pca
        mode = self._gather_mode(cube.shape[-1])
        if mode not in self._predicts:
            self._predicts[mode] = self._build(mode)
        self._predict = self._predicts[mode]
        if mode == "pallas":
            from cmlpl_tpu.ops.patch_gather import lane_pad_cube

            cube = lane_pad_cube(cube)
        elif mode == "pallas_bf16":
            from cmlpl_tpu.ops.patch_gather import build_shifted_cube_bf16

            cube = build_shifted_cube_bf16(cube)

        from cmlpl_tpu.core.mesh import host_to_global, is_multiprocess

        if is_multiprocess(self.mesh):
            axis = self.mesh.axis_names[0]
            repl = jax.sharding.NamedSharding(self.mesh, P())
            params = jax.tree_util.tree_map(
                lambda a: host_to_global(repl, jax.device_get(a)), params)
            cube = host_to_global(repl, jax.device_get(cube))
            spectra = host_to_global(repl, jax.device_get(scene.spectra))
            tiles = host_to_global(
                jax.sharding.NamedSharding(self.mesh, P(axis, None)),
                idx_tiles)
            preds = self._predict(params, cube, spectra, tiles,
                                  scene.n_pc)
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(preds,
                                                         tiled=True)
            return np.asarray(gathered).reshape(-1)[:k]

        preds = self._predict(params, cube, scene.spectra,
                              jnp.asarray(idx_tiles), scene.n_pc)
        return np.asarray(jax.device_get(preds)).reshape(-1)[:k]
