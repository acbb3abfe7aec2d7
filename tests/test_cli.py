"""CLI end-to-end regression: sample_generation -> train -> predict on
the synthetic scene, through the real mains (tiny sizes)."""

import os

import numpy as np
import pytest


ARGS = ["--dataID", "0", "--n_PC", "16", "--num_epochs", "2",
        "--labeled_batch_size", "16", "--unlabeled_batch_size", "16",
        "--num_unlabel", "64", "--val_batch_size", "256",
        "--dropout", "0.5", "--print_per_batches", "0"]


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_sample_generation_cli(workdir):
    from cmlpl_tpu.cli.sample_generation import main

    main(["--dataID", "0", "--num_label", "5", "--n_PC", "16",
          "--data_root", "./dataset"])
    out = os.path.join("dataset", "Synthetic")
    for f in ["X.npy", "Y.npy", "train_array.npy", "test_array.npy",
              "unlabel_array.npy"]:
        assert os.path.exists(os.path.join(out, f)), f
    train = np.load(os.path.join(out, "train_array.npy"))
    assert train.shape == (45,)


def test_scene_npz_ingestion_cli(workdir):
    """--scene_npz (bring-your-own-cube) + --splits_dir through the real
    mains: sample_generation materialises the splits from the npz scene,
    then cli.train ingests BOTH — the reference-oracle A/B's data path
    (scripts/reference_oracle.py)."""
    import jax

    from cmlpl_tpu.cli.sample_generation import main as sample_main
    from cmlpl_tpu.cli.train import main as train_main
    from cmlpl_tpu.data import synthetic_scene

    cube, gt = synthetic_scene(0, rows=28, cols=24)
    np.savez("scene.npz", cube=cube, gt=gt)
    sample_main(["--dataID", "0", "--n_PC", "16",
                 "--scene_npz", "scene.npz", "--data_root", "./dataset"])
    # the splits must come from the npz scene's gt, not the default one
    train = np.load("dataset/Synthetic/train_array.npy")
    labels = np.asarray(gt).reshape(-1)
    assert (labels[train] > 0).all() and train.shape == (45,)

    acc_b, _ = train_main(ARGS + [
        "--scene_npz", "scene.npz",
        "--splits_dir", "./dataset/Synthetic"])
    assert 0.0 <= acc_b.oa <= 1.0


def test_train_then_predict_cli(workdir):
    from cmlpl_tpu.cli.predict import main as predict_main
    from cmlpl_tpu.cli.train import main as train_main

    acc_b, acc_e = train_main(ARGS + ["--checkpoint_dir", "./ckpt",
                                      "--metrics_csv", "./metrics.csv"])
    assert 0.0 <= acc_b.oa <= 1.0
    assert os.path.exists("Experiment_0/label_5/cmlpl_results.csv")
    # --metrics_csv: per-step training history
    import pandas as pd

    hist = pd.read_csv("./metrics.csv")
    assert {"total_loss", "cls_loss", "con_loss", "acc"} <= set(hist.columns)
    assert len(hist) == 2 * 4  # 2 epochs x (64 // 16) steps
    svgs = [f for f in os.listdir("Experiment_0/label_5")
            if f.endswith(".svg")]
    assert svgs

    pred = predict_main(ARGS + ["--checkpoint_dir", "./ckpt",
                                "--out", "./map.svg"])
    assert os.path.exists("./map.svg")
    assert pred.shape == (64 * 48,)


def test_export_model_cli_native_bundle(workdir):
    """export_model --native_dir: train -> export (zip verify=exact) ->
    the native bundle parses through the real C++ host binary."""
    from cmlpl_tpu.cli.export_model import main as export_main
    from cmlpl_tpu.cli.train import main as train_main
    from cmlpl_tpu.native.pjrt_launcher import build_host

    train_main(ARGS + ["--checkpoint_dir", "./ckpt"])
    export_main(ARGS + ["--checkpoint_dir", "./ckpt", "--out", "m.zip",
                        "--verify", "--platform", "cpu",
                        "--native_dir", "./nb"])
    assert os.path.exists("m.zip")
    for f in ("module.stablehlo", "compile_options.pb", "signature.txt",
              "meta.json"):
        assert os.path.getsize(os.path.join("nb", f)) > 0
    host = build_host()
    if host is not None:
        import subprocess

        out = subprocess.run([host, "--dump_signature", "./nb"],
                             capture_output=True, text=True, check=True)
        assert out.stdout.splitlines()[-1].startswith("output labels i32 ")


def test_train_backbone_cli(workdir):
    from cmlpl_tpu.cli.train_backbone import main

    acc = main(["--dataID", "0", "--model", "basenet2", "--n_PC", "16",
                "--num_epochs", "4", "--labeled_batch_size", "45",
                "--val_batch_size", "256", "--print_per_batches", "0"])
    assert 0.0 <= acc.oa <= 1.0


def test_fused_iters_cli(workdir):
    """--num_iters 2 --fused_iters: both runs in one vmapped dispatch,
    per-seed eval + mean±std report through the real main."""
    from cmlpl_tpu.cli.train import main as train_main

    acc_b, acc_e = train_main(ARGS + ["--num_iters", "2", "--fused_iters",
                                      "--metrics_csv", "./metrics.csv"])
    assert 0.0 <= acc_b.oa <= 1.0
    import pandas as pd

    hist = pd.read_csv("./metrics.csv")  # seed 0's history
    assert len(hist) == 2 * 4
    out = "Experiment_0/label_5"
    assert os.path.exists(os.path.join(out, "cmlpl_results.csv"))
    svgs = [f for f in os.listdir(out) if f.endswith(".svg")]
    assert len(svgs) >= 1  # one map per iteration (names can collide)


def test_cps_and_cct_cli(workdir):
    from cmlpl_tpu.cli.train_cct import main as cct_main
    from cmlpl_tpu.cli.train_cps import main as cps_main

    acc_b, acc_e = cps_main(ARGS)
    assert 0.0 <= acc_b.oa <= 1.0
    assert os.path.exists("Experiment_0/label_5/cps_results.csv")

    acc = cct_main(ARGS)
    assert 0.0 <= acc.oa <= 1.0
    assert os.path.exists("Experiment_0/label_5/cct_results.csv")


def _one_epoch(args):
    out = list(args)
    out[out.index("--num_epochs") + 1] = "1"
    return out


def _kill_and_resume(main, args, capsys):
    """Train 1 epoch with a final checkpoint, then resume for epoch 2:
    the restart must pick up at epoch 1, not retrain from scratch."""
    main(_one_epoch(args) + ["--checkpoint_dir", "./ckpt"])
    assert os.path.isdir("ckpt")
    capsys.readouterr()
    result = main(args + ["--checkpoint_dir", "./ckpt", "--resume"])
    captured = capsys.readouterr().out
    assert "resumed from step" in captured
    assert "(epoch 1)" in captured
    return result


def test_cps_cli_kill_and_resume(workdir, capsys):
    from cmlpl_tpu.cli.train_cps import main

    acc_b, _ = _kill_and_resume(main, ARGS, capsys)
    assert 0.0 <= acc_b.oa <= 1.0


def test_cct_cli_kill_and_resume(workdir, capsys):
    from cmlpl_tpu.cli.train_cct import main

    acc = _kill_and_resume(main, ARGS, capsys)
    assert 0.0 <= acc.oa <= 1.0


def test_backbone_cli_kill_and_resume(workdir, capsys):
    from cmlpl_tpu.cli.train_backbone import main

    args = ["--dataID", "0", "--model", "basenet2", "--n_PC", "16",
            "--num_epochs", "4", "--labeled_batch_size", "45",
            "--val_batch_size", "256", "--print_per_batches", "0",
            "--checkpoint_dir", "./ckpt"]
    one = list(args)
    one[one.index("--num_epochs") + 1] = "2"
    main(one)
    capsys.readouterr()
    acc = main(args + ["--resume"])
    captured = capsys.readouterr().out
    assert "resumed from step" in captured
    assert "(epoch 2)" in captured
    assert 0.0 <= acc.oa <= 1.0


def test_cmlpl_cli_kill_and_resume(workdir, capsys):
    from cmlpl_tpu.cli.train import main

    acc_b, _ = _kill_and_resume(main, ARGS, capsys)
    assert 0.0 <= acc_b.oa <= 1.0


def test_elastic_recovery_cli(workdir, capsys):
    """--max_restarts elastic recovery: a mid-run failure (injected after
    epoch 1's checkpoint) is caught by the run_resilient supervisor,
    which retries with --resume and completes the schedule from the
    restart point instead of dying (the reference has no failure
    handling: any exception kills the run, SURVEY §5)."""
    import pytest

    from cmlpl_tpu.cli._common import run_resilient
    from cmlpl_tpu.cli.train import main

    args = ARGS + ["--checkpoint_dir", "./ckpt", "--checkpoint_every",
                   "1", "--fail_at_epoch", "1"]

    # without restarts budget the injected failure propagates
    with pytest.raises(RuntimeError, match="fault injection"):
        run_resilient(main, args)
    capsys.readouterr()

    acc_b, _ = run_resilient(main, args + ["--max_restarts", "1"])
    captured = capsys.readouterr().out
    assert "restart 1/1 from the latest checkpoint" in captured
    assert "resumed from step" in captured
    assert "(epoch 1)" in captured
    assert 0.0 <= acc_b.oa <= 1.0


def test_serve_cli_persistent_loop(workdir):
    """serve: one warm process classifies multiple scenes from JSON-line
    requests (including an error line that must not kill the loop)."""
    import io
    import json

    from cmlpl_tpu.cli.serve import main as serve_main
    from cmlpl_tpu.cli.train import main as train_main
    from cmlpl_tpu.data import synthetic_scene

    train_main(ARGS + ["--checkpoint_dir", "./ckpt"])

    cube, _ = synthetic_scene(0)
    np.save("scene.npy", cube)
    requests = "\n".join([
        json.dumps({"cube": "scene.npy", "out": "map.npy", "id": "r1"}),
        json.dumps({"cube": "missing.npy", "id": "bad"}),
        "this is not json",
        json.dumps({"id": "r2", "out": "map2.svg"}),  # registered scene
    ])
    out = io.StringIO()
    serve_main(ARGS + ["--checkpoint_dir", "./ckpt", "--no_warmup"],
               stdin=io.StringIO(requests), stdout=out)

    lines = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert lines[0]["ready"] is True
    r1, bad, malformed, r2 = lines[1:]
    assert r1["id"] == "r1" and r1["pixels"] == 64 * 48
    assert os.path.exists("map.npy")
    assert np.load("map.npy").shape == (64 * 48,)
    assert bad["id"] == "bad" and "error" in bad
    assert malformed["id"] is None and "JSONDecodeError" in malformed["error"]
    assert r2["id"] == "r2" and os.path.exists("map2.svg")
