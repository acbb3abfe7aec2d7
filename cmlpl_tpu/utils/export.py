"""AOT model export — serialized StableHLO deployment artifacts.

The reference has no deployment story at all: ``test_whole`` runs inline
at the tail of each training script (train.py:291-309) and serving means
re-running training code.  ``cli/predict.py`` (one-shot) and
``cli/serve.py`` (warm process) already close that loop at runtime; this
module closes it *ahead of time*: the jitted whole-scene predictor —
trained weights baked in as constants — is serialized with
``jax.export`` to a single portable file that any JAX runtime for the
same platform can load and run with NO framework code, checkpoint
format, or model definition.

Artifact = a zip with two entries:

- ``meta.json``  — geometry (rows/cols/n_pc/patch_size), dataset id,
  gather mode, platforms, framework version; everything a consumer
  needs to prepare inputs and render the class map.
- ``model.bin``  — the ``jax.export`` serialization (StableHLO + the
  calling convention), weights embedded.

The exported callable's signature is fixed to the scene geometry:
``f(padded_cube, spectra) -> (num_pixels,) int32`` 0-based class ids.
Gather modes: ``xla`` (patch-exact tiled evaluation) and ``dense`` (the
dilated whole-scene pass, BaseNet2/CCT only) serialize as pure StableHLO
and are portable across platforms; the Pallas modes embed a Mosaic
custom-call and stay a runtime-only optimisation, so they are rejected
here.
"""

from __future__ import annotations

import json
import zipfile
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cmlpl_tpu.data.prep import PreparedScene

FORMAT_VERSION = 1


def _tiled_scene_fn(apply_fn: Callable, params, scene: PreparedScene,
                    tile: int):
    """Whole-scene predictor (XLA gather) with params/tiling baked in —
    the single-device branch of eval/inference.ScenePredictor, closed
    over its constants so the exported graph has a (cube, spectra)
    signature."""
    w = scene.patch_size
    cols = scene.cols
    n_pc = scene.n_pc
    k = scene.num_pixels
    padded_k = -(-k // tile) * tile
    idx = np.arange(padded_k, dtype=np.int32)
    idx[k:] = 0
    idx_tiles = jnp.asarray(idx.reshape(-1, tile))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def predict(padded, spectra):
        def one_tile(tidx):
            r = tidx // cols
            c = tidx % cols

            def slice_one(ri, ci):
                return lax.dynamic_slice(
                    padded, (ri, ci, 0), (w, w, padded.shape[-1]))

            xp = jax.vmap(slice_one)(r, c)[..., :n_pc]
            x = jnp.take(spectra, tidx, axis=0)
            logits = apply_fn(params, xp, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        return lax.map(one_tile, idx_tiles).reshape(-1)[:k]

    return predict


def _dense_scene_fn(params, scene: PreparedScene):
    """Dense dilated whole-scene predictor with params baked in
    (BaseNet2/CCT param trees; see eval/inference.dense_scene_logits)."""
    from cmlpl_tpu.eval.inference import _dense_logits, _dense_params_view

    if scene.patch_size % 4 != 0:
        raise ValueError("dense export needs patch_size % 4 == 0 "
                         f"(got {scene.patch_size})")
    view = jax.tree_util.tree_map(jnp.asarray, _dense_params_view(params))
    rows, cols, w = scene.rows, scene.cols, scene.patch_size

    def predict(padded, spectra):
        return jnp.argmax(
            _dense_logits(view, padded, spectra, rows, cols, w),
            -1).astype(jnp.int32)

    return predict


def build_exported(apply_fn: Optional[Callable], params,
                   scene: PreparedScene, *, gather: str = "xla",
                   tile: int = 4096,
                   platforms: Optional[Sequence[str]] = None,
                   extra_meta: Optional[dict] = None):
    """Trace + lower the whole-scene predictor.  Returns
    ``(meta, jax.export.Exported)`` — the object form feeds both the zip
    artifact (``exported.serialize()``) and the native host bundle
    (:func:`save_native_bundle`).

    ``platforms``: lowering platforms (e.g. ``["tpu"]``, ``["cpu"]``,
    or both); defaults to jax.export's default (the current backend).
    """
    if gather == "dense":
        fn = _dense_scene_fn(params, scene)
    elif gather == "xla":
        if apply_fn is None:
            raise ValueError("gather='xla' needs apply_fn")
        fn = _tiled_scene_fn(apply_fn, params, scene, tile)
    else:
        raise ValueError(
            f"gather={gather!r} cannot be serialized (the Pallas modes "
            "embed a Mosaic custom-call); use 'xla' or 'dense'")

    kw = {} if platforms is None else {"platforms": list(platforms)}
    exported = jax.export.export(jax.jit(fn), **kw)(
        jax.ShapeDtypeStruct(np.shape(scene.padded_pca),
                             np.asarray(scene.padded_pca).dtype),
        jax.ShapeDtypeStruct(np.shape(scene.spectra),
                             np.asarray(scene.spectra).dtype))
    meta = {
        "format_version": FORMAT_VERSION,
        "rows": scene.rows, "cols": scene.cols,
        "num_pixels": scene.num_pixels,
        "n_pc": scene.n_pc, "patch_size": scene.patch_size,
        "cube_shape": list(np.shape(scene.padded_pca)),
        "spectra_shape": list(np.shape(scene.spectra)),
        "gather": gather, "tile": tile,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    if extra_meta:
        meta.update(extra_meta)
    return meta, exported


def export_scene_predictor(apply_fn: Optional[Callable], params,
                           scene: PreparedScene, *, gather: str = "xla",
                           tile: int = 4096,
                           platforms: Optional[Sequence[str]] = None,
                           extra_meta: Optional[dict] = None):
    """Serialize the whole-scene predictor.  Returns ``(meta, payload)``."""
    meta, exported = build_exported(
        apply_fn, params, scene, gather=gather, tile=tile,
        platforms=platforms, extra_meta=extra_meta)
    return meta, exported.serialize()


_NATIVE_DTYPES = {"float32": "f32", "int32": "i32",
                  "bfloat16": "bf16", "uint8": "u8"}


def save_native_bundle(dir_path: str, meta: dict, exported) -> None:
    """Write the C++ PJRT host bundle (see native/pjrt_host.cc):

    - ``module.stablehlo``    raw StableHLO bytecode, weights baked in
    - ``compile_options.pb``  serialized xla CompileOptionsProto
    - ``signature.txt``       one ``input|output <name> <dtype> <dims>``
      line per argument — all the host parses
    - ``meta.json``           the artifact metadata (humans / Python)

    Unlike the zip artifact (a ``jax.export`` serialization that needs a
    JAX runtime to load), this is the raw compiler contract: any PJRT
    C-API plugin can compile ``module.stablehlo`` with the recorded
    options — no Python in the serving path.
    """
    import os

    from jax._src import compiler as _compiler

    if len(exported.platforms) != 1:
        # multi-platform exports wrap main() with a platform-index arg;
        # the host passes data args only, so require a single platform
        raise ValueError(
            "native bundles need a single lowering platform (got "
            f"{exported.platforms}); pass e.g. platforms=['tpu']")
    if exported.ordered_effects or exported.unordered_effects:
        raise ValueError("effectful exports cannot be served natively")
    os.makedirs(dir_path, exist_ok=True)

    def lines(kind, names, avals):
        out = []
        for name, a in zip(names, avals):
            dt = _NATIVE_DTYPES.get(np.dtype(a.dtype).name)
            if dt is None:
                raise ValueError(f"unsupported dtype {a.dtype} for {name}")
            dims = ",".join(str(int(d)) for d in a.shape)
            out.append(f"{kind} {name} {dt} {dims or '1'}")
        return out

    in_names = [f"in{i}" for i in range(len(exported.in_avals))]
    if len(in_names) == 2:
        in_names = ["padded_pca", "spectra"]
    out_names = [f"out{i}" for i in range(len(exported.out_avals))]
    if len(out_names) == 1:
        out_names = ["labels"]
    sig = (lines("input", in_names, exported.in_avals)
           + lines("output", out_names, exported.out_avals))

    opts = _compiler.get_compile_options(num_replicas=1, num_partitions=1)
    with open(os.path.join(dir_path, "module.stablehlo"), "wb") as f:
        f.write(exported.mlir_module_serialized)
    with open(os.path.join(dir_path, "compile_options.pb"), "wb") as f:
        f.write(opts.SerializeAsString())
    with open(os.path.join(dir_path, "signature.txt"), "w") as f:
        f.write("\n".join(sig) + "\n")
    with open(os.path.join(dir_path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def save_exported(path: str, meta: dict, payload: bytes) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("model.bin", payload)


def load_exported(path: str):
    """Load an artifact: returns ``(meta, fn)`` where
    ``fn(padded_cube, spectra) -> (num_pixels,) int32`` runs the
    deserialized executable under jit."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        exported = jax.export.deserialize(z.read("model.bin"))
    call = jax.jit(exported.call)

    def fn(padded, spectra):
        return np.asarray(jax.device_get(call(padded, spectra)))

    return meta, fn


def _load_raw(path: str):
    """meta + the raw ``jax.export.Exported`` (tests, introspection)."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        return meta, jax.export.deserialize(z.read("model.bin"))


def read_meta(path: str) -> dict:
    with zipfile.ZipFile(path) as z:
        return json.loads(z.read("meta.json"))
