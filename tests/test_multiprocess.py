"""The pod path, actually executed: 2 separate processes x 4 virtual CPU
devices join one jax.distributed cluster (the CLIs' --multihost entry
point) and run CMLPL/CPS/CCT train steps over the GLOBAL 8-device mesh.

This is the multi-HOST analogue of test_sharding.py's single-process
8-device mesh tests: it exercises the non-addressable-sharding code path
(core.mesh.host_to_global, the trainers' _put/init_state pod branches)
and Gloo cross-process collectives, and asserts the metrics equal the
single-process values.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 2-process pod cluster tests (VERDICT r3 item 5)

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_expected():
    import jax

    from cmlpl_tpu.core.mesh import create_mesh
    from cmlpl_tpu.data import (SemiSupervisedSampler, generate_splits,
                                prepare_scene, synthetic_scene)
    from cmlpl_tpu.train import (CCTTrainer, CMLPLConfig, CMLPLTrainer,
                                 CPSTrainer)

    cube, gt = synthetic_scene(0, rows=32, cols=24)
    scene = prepare_scene(0, cube=cube, gt=gt, patch_size=20, n_pc=8)
    splits = generate_splits(scene.labels, num_label=5)
    bs = 16
    cfg = CMLPLConfig(num_classes=9, num_features=103, n_pc=8,
                      patch_size=20, labeled_batch=bs, unlabeled_batch=bs,
                      num_unlabel=64, num_epochs=1)
    mesh = create_mesh(jax.devices()[:8])
    sam = SemiSupervisedSampler(splits, scene.labels, bs, bs,
                                num_unlabel=64)
    li, ly, ui = next(iter(sam.epoch()))
    out = {}
    for name, cls, kw in [("cmlpl", CMLPLTrainer,
                           dict(epoch=1, batch_index=0)),
                          ("cps", CPSTrainer, {}),
                          ("cct", CCTTrainer, {})]:
        t = cls(cfg, mesh=mesh, donate=False)
        s = t.init_state(jax.random.key(0))
        _, m = t.train_step(s, scene, li, ly, ui, **kw)
        out[name] = {k: float(np.asarray(v)) for k, v in m.items()}

    from cmlpl_tpu.models.zoo import build_model
    from cmlpl_tpu.registry import get_dataset
    from cmlpl_tpu.train.supervised import SupervisedTrainer

    model, zentry = build_model("basenet2", get_dataset(0), scene.n_pc)
    ts = SupervisedTrainer(model, zentry, patch_size=scene.patch_size,
                           n_pc=scene.n_pc, num_features=103, mesh=mesh,
                           donate=False)
    ss = ts.init_state(jax.random.key(0))
    _, ms = ts.train_step(ss, scene, li, ly)
    out["supervised"] = {k: float(np.asarray(v)) for k, v in ms.items()}

    t = CMLPLTrainer(cfg, mesh=mesh, donate=False)
    s = t.init_state(jax.random.key(0))
    sam2 = SemiSupervisedSampler(splits, scene.labels, bs, bs,
                                 num_unlabel=64)
    _, mm = t.train_run(s, scene, sam2)
    out["cmlpl_run_last"] = {k: float(np.asarray(v).ravel()[-1])
                             for k, v in mm.items()}
    return out


def test_two_process_pod_step_matches_single_process(tmp_path):
    want = _single_process_expected()

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outputs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

    for pid, out in enumerate(outputs):
        lines = [ln for ln in out.splitlines() if ln.startswith("METRICS ")]
        assert lines, f"proc {pid} printed no metrics:\n{out[-2000:]}"
        got = json.loads(lines[0][len("METRICS "):])
        assert got.pop("checkpoint_roundtrip") is True
        assert got.pop("global_mesh_inference") is True
        for algo, metrics in want.items():
            for k, v in metrics.items():
                np.testing.assert_allclose(
                    got[algo][k], v, rtol=2e-3, atol=1e-5,
                    err_msg=f"proc {pid} {algo} {k}")


_CLI_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "multiproc_cli_worker.py")


@pytest.mark.parametrize("algo", ["cmlpl", "cps"])
def test_train_cli_multihost_two_processes(tmp_path, algo):
    """The user-facing pod launch: the SAME `cli.train --multihost`
    command on two processes trains AND evaluates on the global mesh
    (scene tiles split across hosts, strips allgathered), checkpoints
    collectively, resumes pod-safely, and only process 0 writes the
    report artifacts."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, _CLI_WORKER, algo], env=env,
            cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = [p.communicate(timeout=540)[0] for p in procs]
    results = []
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[0][len("RESULT "):]))
    assert results[0]["processes"] == 2
    # both processes computed identical accuracies from the global run,
    # including after the pod-safe --resume (+1 epoch) pass
    assert results[0]["oa_b"] == results[1]["oa_b"]
    assert results[0]["oa_e"] == results[1]["oa_e"]
    assert results[0]["resumed_oa_b"] == results[1]["resumed_oa_b"]
    assert results[0]["resumed_oa_e"] == results[1]["resumed_oa_e"]
    # one writer: the report artifacts exist exactly once (shared cwd)
    csv = "cmlpl_results.csv" if algo == "cmlpl" else "cps_results.csv"
    assert os.path.exists(tmp_path / "Experiment_0/label_5" / csv)
    assert os.path.isdir(tmp_path / "ckpt")
