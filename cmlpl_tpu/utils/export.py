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
                  "bfloat16": "bf16", "uint8": "u8", "uint32": "u32"}


def _keypath_name(path) -> str:
    """Filesystem-safe dotted name for a pytree key path."""
    from jax.tree_util import DictKey, FlattenedIndexKey, GetAttrKey, \
        SequenceKey

    parts = []
    for k in path:
        if isinstance(k, GetAttrKey):
            parts.append(k.name)
        elif isinstance(k, DictKey):
            parts.append(str(k.key))
        elif isinstance(k, SequenceKey):
            parts.append(str(k.idx))
        elif isinstance(k, FlattenedIndexKey):
            parts.append(str(k.key))
        else:
            parts.append(str(k))
    name = ".".join(parts)
    return "".join(c if (c.isalnum() or c in "._") else "_" for c in name)


def build_run_exported(trainer, scene: PreparedScene, sampler, rng, *,
                       platforms: Optional[Sequence[str]] = None):
    """Export the trainer's ENTIRE fused training run as one StableHLO
    program — the native-training contract.

    The reference can only train by running its Python scripts end to
    end (train.py:65-353); here the whole multi-epoch schedule is
    already ONE functional XLA program (``EpochDriver`` whole-run scan),
    so it can be serialized like any inference graph and executed by the
    C++ PJRT host with no Python in the loop: Python prepares the scene,
    the init state, and the pre-drawn schedule once (like a compiler
    front-end), then any PJRT runtime trains.

    Typed PRNG keys cross the boundary as raw uint32 key data
    (``jax.random.key_data`` / ``wrap_key_data``, the same convention as
    checkpoints) since neither .npy nor the PJRT host knows key dtypes.

    Returns ``(meta, exported, inputs)`` where ``inputs`` is the ordered
    ``{name: host ndarray}`` dict matching the exported signature — the
    exact arrays to hand the host — and meta records input/output names
    (state leaves by pytree path, batch arrays, stacked metrics).
    """
    import jax.random as jrandom

    cfg = trainer.config
    state = jax.device_get(trainer.init_state(rng))
    from cmlpl_tpu.train.driver import stack_schedule

    li, ly, ui = stack_schedule(sampler, cfg.num_epochs)
    pool_args = {}
    if cfg.gather_impl == "pool":
        from cmlpl_tpu.ops.patch_gather import poolify_batches

        p, li, ui = poolify_batches(li, ui)
        pool_args = {"pool_idx": p}
    extras = {f"extra{i}": np.asarray(e)
              for i, e in enumerate(trainer._run_extras())}

    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    paths = [p for p, _ in flat]
    is_key = [jnp.issubdtype(l.dtype, jax.dtypes.prng_key)
              for _, l in flat]
    impls = [str(jrandom.key_impl(l)) if k else None
             for (_, l), k in zip(flat, is_key)]
    state_names = ["state." + _keypath_name(p) for p in paths]
    state_vals = [np.asarray(jrandom.key_data(l)) if k else np.asarray(l)
                  for (_, l), k in zip(flat, is_key)]

    inputs = dict(zip(state_names, state_vals))
    inputs["padded_pca"] = np.asarray(scene.padded_pca)
    inputs["spectra"] = np.asarray(scene.spectra)
    inputs.update(pool_args)
    inputs.update({"lab_idx": li, "lab_y": ly, "unl_idx": ui})
    inputs.update(extras)

    n_state = len(state_vals)
    raw = getattr(trainer, "_raw_run", None)
    if raw is None:
        raise ValueError(
            f"{type(trainer).__name__} has no exportable whole-run "
            "entry (_raw_run); native training covers the "
            "semi-supervised trainers (CMLPL/CPS/CCT)")
    cols = scene.cols

    def run_flat(*args):
        leaves = [jrandom.wrap_key_data(a, impl=im) if k else a
                  for a, k, im in zip(args[:n_state], is_key, impls)]
        st = jax.tree_util.tree_unflatten(treedef, leaves)
        new_state, metrics = raw(st, *args[n_state:], cols)
        out_flat = jax.tree_util.tree_leaves(new_state)
        out = [jrandom.key_data(l) if k else l
               for l, k in zip(out_flat, is_key)]
        mflat, _ = jax.tree_util.tree_flatten_with_path(metrics)
        return tuple(out) + tuple(v for _, v in mflat)

    kw = {} if platforms is None else {"platforms": list(platforms)}
    exported = jax.export.export(jax.jit(run_flat), **kw)(
        *[jax.ShapeDtypeStruct(v.shape, v.dtype)
          for v in inputs.values()])

    # recover metric names from a shape-only trace of raw
    m_eval = jax.eval_shape(
        lambda *a: raw(jax.tree_util.tree_unflatten(
            treedef, [jrandom.wrap_key_data(x, impl=im) if k else x
                      for x, k, im in zip(a[:n_state], is_key, impls)]),
            *a[n_state:], cols)[1],
        *[jax.ShapeDtypeStruct(v.shape, v.dtype)
          for v in inputs.values()])
    metric_names = ["metrics." + _keypath_name(p)
                    for p, _ in jax.tree_util.tree_flatten_with_path(
                        m_eval)[0]]
    out_names = state_names + metric_names

    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "train_run",
        "trainer": type(trainer).__name__,
        "num_epochs": cfg.num_epochs,
        "batches_per_epoch": int(li.shape[1]),
        "gather_impl": cfg.gather_impl,
        "rng_impl": cfg.rng_impl,
        "input_names": list(inputs.keys()),
        "output_names": out_names,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    return meta, exported, inputs


def save_run_bundle(dir_path: str, meta: dict, exported, inputs) -> None:
    """Native training bundle: the host bundle files (module.stablehlo /
    compile_options.pb / signature.txt / meta.json) plus ``inputs/``
    holding one ``<name>.npy`` per exported input — everything the C++
    host needs to run the whole training schedule:

        pjrt_host --plugin P --bundle DIR --inputs DIR/inputs --outdir O
    """
    import os

    save_native_bundle(dir_path, meta, exported,
                       in_names=meta["input_names"],
                       out_names=meta["output_names"])
    idir = os.path.join(dir_path, "inputs")
    os.makedirs(idir, exist_ok=True)
    for name, val in inputs.items():
        np.save(os.path.join(idir, name + ".npy"), val)


def load_run_outputs(bundle_dir: str, outdir: str, template_state):
    """Rebuild ``(state, metrics)`` from a native host training run.

    ``pjrt_host --inputs --outdir`` writes one ``<name>.npy`` per
    signature output; this inverts :func:`build_run_exported`'s
    flattening — state leaves come back in pytree order with typed PRNG
    keys re-wrapped from their raw uint32 data, metrics as a plain
    ``{name: (E, N) ndarray}`` dict — so a natively-trained run feeds
    straight into ``utils/checkpoint.save_checkpoint`` and from there
    into predict/serve.
    """
    import os

    import jax.random as jrandom

    with open(os.path.join(bundle_dir, "meta.json")) as f:
        meta = json.load(f)
    names = meta["output_names"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(template_state)
    if len(names) < len(flat):
        raise ValueError(
            f"bundle has {len(names)} outputs but the template state "
            f"has {len(flat)} leaves — wrong trainer/config?")
    leaves = []
    for (path, tmpl), name in zip(flat, names[: len(flat)]):
        arr = np.load(os.path.join(outdir, name + ".npy"))
        if jnp.issubdtype(tmpl.dtype, jax.dtypes.prng_key):
            arr = jrandom.wrap_key_data(
                arr, impl=str(jrandom.key_impl(tmpl)))
        elif arr.shape != np.shape(tmpl) or arr.dtype != tmpl.dtype:
            raise ValueError(
                f"{name}: got {arr.dtype}{arr.shape}, template wants "
                f"{tmpl.dtype}{np.shape(tmpl)}")
        leaves.append(arr)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    metrics = {}
    for name in names[len(flat):]:
        metrics[name.removeprefix("metrics.")] = np.load(
            os.path.join(outdir, name + ".npy"))
    return state, metrics


def save_native_bundle(dir_path: str, meta: dict, exported, *,
                       in_names: Optional[Sequence[str]] = None,
                       out_names: Optional[Sequence[str]] = None) -> None:
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
            # "-" marks rank-0 (the parser needs a 4th token per line)
            dims = ",".join(str(int(d)) for d in a.shape)
            out.append(f"{kind} {name} {dt} {dims or '-'}")
        return out

    if in_names is None:
        in_names = [f"in{i}" for i in range(len(exported.in_avals))]
        if len(in_names) == 2:
            in_names = ["padded_pca", "spectra"]
    if out_names is None:
        out_names = [f"out{i}" for i in range(len(exported.out_avals))]
        if len(out_names) == 1:
            out_names = ["labels"]
    if (len(in_names) != len(exported.in_avals)
            or len(out_names) != len(exported.out_avals)):
        raise ValueError("signature name count mismatch")
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
