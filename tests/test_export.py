"""AOT export (utils/export.py): the serialized StableHLO artifact must
reproduce the in-process predictor exactly and round-trip through the
zip container, weights included (no checkpoint / model code at load
time)."""

import os

import jax
import numpy as np
import pytest

from cmlpl_tpu.eval import ScenePredictor
from cmlpl_tpu.models import BaseNet2
from cmlpl_tpu.utils.export import (
    export_scene_predictor,
    load_exported,
    read_meta,
    save_exported,
)


@pytest.fixture(scope="module")
def net_and_params(request):
    scene = request.getfixturevalue("tiny_scene")
    model = BaseNet2(num_features=103, num_classes=9, n_pc=scene.n_pc)
    xp0 = np.zeros((1, scene.patch_size, scene.patch_size, scene.n_pc),
                   np.float32)
    x0 = np.zeros((1, 103), np.float32)
    params = model.init(jax.random.key(7), xp0, x0,
                        train=False)["params"]

    def apply_fn(pr, xp, x):
        return model.apply({"params": pr}, xp, x, train=False)[0]

    return apply_fn, params


@pytest.mark.parametrize("gather", ["xla", "dense"])
def test_export_roundtrip_matches_predictor(tiny_scene, net_and_params,
                                            tmp_path, gather):
    apply_fn, params = net_and_params
    meta, payload = export_scene_predictor(
        apply_fn, params, tiny_scene, gather=gather, tile=256,
        platforms=["cpu"], extra_meta={"dataset": "Synthetic"})
    path = os.path.join(tmp_path, f"m_{gather}.zip")
    save_exported(path, meta, payload)

    meta2, fn = load_exported(path)
    assert meta2["gather"] == gather
    assert meta2["num_pixels"] == tiny_scene.num_pixels
    assert meta2["dataset"] == "Synthetic"
    assert read_meta(path)["rows"] == tiny_scene.rows
    preds = fn(tiny_scene.padded_pca, tiny_scene.spectra)
    assert preds.shape == (tiny_scene.num_pixels,)
    assert preds.dtype == np.int32

    ref = ScenePredictor(apply_fn, patch_size=tiny_scene.patch_size,
                         cols=tiny_scene.cols, tile=256,
                         gather=gather)(params, tiny_scene)
    np.testing.assert_array_equal(preds, ref)


def test_export_rejects_pallas_modes(tiny_scene, net_and_params):
    apply_fn, params = net_and_params
    with pytest.raises(ValueError, match="Mosaic"):
        export_scene_predictor(apply_fn, params, tiny_scene,
                               gather="pallas_bf16", platforms=["cpu"])


@pytest.mark.parametrize("algo", ["cmlpl", "cps", "cct"])
def test_run_export_matches_train_run(tiny_scene, tiny_splits, algo):
    """The exported whole-training-run program (build_run_exported,
    serialized + deserialized) reproduces trainer.train_run exactly —
    final state (PRNG keys compared as raw key data) and every stacked
    metric, for all three semi-supervised trainers (CCT's two
    overlapping optimizers included).  This pins the native-training
    contract's numerics hermetically; the hardware A/B
    (scripts/native_train_ab.py) then only needs to vouch for the C++
    host's PJRT plumbing."""
    import jax.numpy as jnp
    import jax.random as jrandom

    from cmlpl_tpu.data import SemiSupervisedSampler
    from cmlpl_tpu.train import CCTTrainer, CMLPLTrainer, CPSTrainer
    from cmlpl_tpu.train.state import CMLPLConfig
    from cmlpl_tpu.utils.export import build_run_exported

    cfg = CMLPLConfig(n_pc=16, labeled_batch=16, unlabeled_batch=16,
                      num_epochs=2, num_unlabel=64, dropout=0.5)

    def sampler():
        # fresh instance per side: same seed -> identical schedule draws
        return SemiSupervisedSampler(tiny_splits, tiny_scene.labels, 16,
                                     16, num_unlabel=64, seed=1088)

    trainer = {"cmlpl": CMLPLTrainer, "cps": CPSTrainer,
               "cct": CCTTrainer}[algo](cfg)
    rng = jax.random.key(0)
    meta, exported, inputs = build_run_exported(trainer, tiny_scene,
                                                sampler(), rng)
    call = jax.jit(jax.export.deserialize(exported.serialize()).call)
    outs = call(*inputs.values())

    state, metrics = trainer.train_run(trainer.init_state(rng),
                                       tiny_scene, sampler())
    state, metrics = jax.device_get((state, metrics))
    ref = [jrandom.key_data(l)
           if jnp.issubdtype(l.dtype, jax.dtypes.prng_key) else l
           for l in jax.tree_util.tree_leaves(state)]
    ref += [v for _, v in
            jax.tree_util.tree_flatten_with_path(metrics)[0]]
    assert len(outs) == len(ref) == len(meta["output_names"])
    for name, a, b in zip(meta["output_names"], outs, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)

    if algo != "cmlpl":
        return
    # close the native-training workflow loop: host-style .npy outputs
    # -> cli.export_model --import_run -> orbax checkpoint == train_run
    # state (so natively trained params feed predict/serve)
    import json
    import tempfile

    from cmlpl_tpu.cli.export_model import main as export_main
    from cmlpl_tpu.utils.checkpoint import restore_checkpoint

    with tempfile.TemporaryDirectory() as td:
        bundle = os.path.join(td, "bundle")
        outdir = os.path.join(td, "out")
        ckpt = os.path.join(td, "ckpt")
        os.makedirs(bundle)
        os.makedirs(outdir)
        with open(os.path.join(bundle, "meta.json"), "w") as f:
            json.dump(meta, f)
        for name, a in zip(meta["output_names"], outs):
            np.save(os.path.join(outdir, name + ".npy"), np.asarray(a))
        export_main(["--dataID", "0", "--n_PC", "16",
                     "--labeled_batch_size", "16",
                     "--unlabeled_batch_size", "16", "--num_epochs", "2",
                     "--num_unlabel", "64", "--dropout", "0.5",
                     "--import_run", bundle, outdir,
                     "--checkpoint_dir", ckpt])
        template = jax.device_get(trainer.init_state(jax.random.key(0)))
        restored = restore_checkpoint(ckpt, template)
        for (path, a), b in zip(
                jax.tree_util.tree_flatten_with_path(
                    jax.device_get(restored))[0],
                jax.tree_util.tree_leaves(state)):
            a2 = (jrandom.key_data(a)
                  if jnp.issubdtype(a.dtype, jax.dtypes.prng_key) else a)
            b2 = (jrandom.key_data(b)
                  if jnp.issubdtype(b.dtype, jax.dtypes.prng_key) else b)
            np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2),
                                          err_msg=str(path))


def test_export_cli_with_verify(tmp_path, monkeypatch):
    """checkpoint -> cli.export_model --verify: export, reload, compare
    against the in-process predictor through the real mains."""
    monkeypatch.chdir(tmp_path)
    from cmlpl_tpu.cli.export_model import main as export_main
    from cmlpl_tpu.cli.train import main as train_main

    args = ["--dataID", "0", "--n_PC", "16", "--num_epochs", "1",
            "--labeled_batch_size", "16", "--unlabeled_batch_size", "16",
            "--num_unlabel", "64", "--val_batch_size", "256",
            "--print_per_batches", "0"]
    train_main(args + ["--checkpoint_dir", "./ckpt"])
    out = export_main(args + ["--checkpoint_dir", "./ckpt",
                              "--out", "./model.zip", "--verify",
                              "--platform", "cpu",
                              "--eval_gather", "dense"])
    assert os.path.exists(out)
    meta = read_meta(out)
    assert meta["gather"] == "dense"
    assert meta["dataID"] == 0
