"""Native PJRT serving host (native/pjrt_host.cc + pjrt_launcher.py).

No PJRT plugin .so is loadable on CPU CI, so the end-to-end TPU path is
exercised by scripts/native_serve_ab.py on hardware; here we pin the
hermetic contract between the Python bundle writer and the C++ host:

- the host binary builds from source with the image's pjrt_c_api.h;
- its .npy reader/writer round-trips NumPy files bit-exactly;
- ``save_native_bundle`` emits exactly the files + signature grammar the
  host parses (cross-checked through the host's --dump_signature mode);
- launcher plumbing (plugin discovery, axon client options) stays sane.
"""

import json
import os
import subprocess

import jax
import numpy as np
import pytest

from cmlpl_tpu.models import BaseNet2
from cmlpl_tpu.native.pjrt_launcher import (
    build_host,
    client_options,
    discover_plugin,
    plugin_env,
)
from cmlpl_tpu.utils.export import build_exported, save_native_bundle


@pytest.fixture(scope="module")
def host_bin():
    path = build_host()
    if path is None:
        pytest.skip("no g++ / pjrt_c_api.h in this environment")
    return path


def test_npy_roundtrip_f32(host_bin, tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((5, 7, 3)).astype(np.float32)
    src = os.path.join(tmp_path, "a.npy")
    dst = os.path.join(tmp_path, "b.npy")
    np.save(src, arr)
    out = subprocess.run([host_bin, "--npy_roundtrip", src, dst],
                         capture_output=True, text=True, check=True)
    assert out.stdout.startswith("ok 105")
    back = np.load(dst)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, arr)


def test_npy_roundtrip_i32_1d(host_bin, tmp_path):
    arr = np.arange(11, dtype=np.int32)
    src = os.path.join(tmp_path, "i.npy")
    dst = os.path.join(tmp_path, "o.npy")
    np.save(src, arr)
    subprocess.run([host_bin, "--npy_roundtrip", src, dst],
                   capture_output=True, text=True, check=True)
    np.testing.assert_array_equal(np.load(dst), arr)


@pytest.fixture(scope="module")
def native_bundle(tmp_path_factory, request):
    scene = request.getfixturevalue("tiny_scene")
    model = BaseNet2(num_features=103, num_classes=9, n_pc=scene.n_pc)
    xp0 = np.zeros((1, scene.patch_size, scene.patch_size, scene.n_pc),
                   np.float32)
    x0 = np.zeros((1, 103), np.float32)
    params = model.init(jax.random.key(7), xp0, x0, train=False)["params"]

    def apply_fn(pr, xp, x):
        return model.apply({"params": pr}, xp, x, train=False)[0]

    meta, exported = build_exported(apply_fn, params, scene, gather="xla",
                                    tile=256, platforms=["cpu"])
    d = str(tmp_path_factory.mktemp("bundle"))
    save_native_bundle(d, meta, exported)
    return d, scene


def test_bundle_files_and_meta(native_bundle):
    d, scene = native_bundle
    for f in ("module.stablehlo", "compile_options.pb", "signature.txt",
              "meta.json"):
        assert os.path.getsize(os.path.join(d, f)) > 0
    meta = json.load(open(os.path.join(d, "meta.json")))
    assert meta["num_pixels"] == scene.num_pixels
    # StableHLO bytecode artifacts start with the MLIR bytecode magic.
    head = open(os.path.join(d, "module.stablehlo"), "rb").read(4)
    assert head == b"ML\xefR"


def test_host_parses_bundle_signature(host_bin, native_bundle):
    d, scene = native_bundle
    out = subprocess.run([host_bin, "--dump_signature", d],
                         capture_output=True, text=True, check=True)
    lines = out.stdout.strip().splitlines()
    pr, pc, ch = np.shape(scene.padded_pca)
    k, b = np.shape(scene.spectra)
    assert lines[0] == f"input padded_pca f32 {pr},{pc},{ch}"
    assert lines[1] == f"input spectra f32 {k},{b}"
    assert lines[2] == f"output labels i32 {scene.num_pixels}"


def test_multi_platform_bundle_rejected(native_bundle, request):
    scene = request.getfixturevalue("tiny_scene")
    model = BaseNet2(num_features=103, num_classes=9, n_pc=scene.n_pc)
    xp0 = np.zeros((1, scene.patch_size, scene.patch_size, scene.n_pc),
                   np.float32)
    x0 = np.zeros((1, 103), np.float32)
    params = model.init(jax.random.key(7), xp0, x0, train=False)["params"]

    def apply_fn(pr, xp, x):
        return model.apply({"params": pr}, xp, x, train=False)[0]

    meta, exported = build_exported(apply_fn, params, scene, gather="xla",
                                    tile=256, platforms=["cpu", "tpu"])
    with pytest.raises(ValueError, match="single lowering platform"):
        save_native_bundle("/tmp/should_not_exist_bundle", meta, exported)


@pytest.fixture(scope="module")
def stub_plugin():
    from cmlpl_tpu.native.pjrt_launcher import build_stub_plugin

    path = build_stub_plugin()
    if path is None:
        pytest.skip("no g++ / pjrt_c_api.h in this environment")
    return path


def test_host_full_loop_against_stub_plugin(host_bin, stub_plugin,
                                            tmp_path):
    """Drive the REAL host end-to-end (client create -> compile ->
    upload -> execute -> fetch -> npy write) against the loopback
    plugin, whose contract is output0 := echo of input0."""
    rng = np.random.default_rng(3)
    cube = rng.standard_normal((4, 6, 3)).astype(np.float32)
    spectra = rng.standard_normal((5, 7)).astype(np.float32)
    d = tmp_path / "bundle"
    d.mkdir()
    (d / "module.stablehlo").write_bytes(b"MLIR-bytes-ignored-by-stub")
    (d / "compile_options.pb").write_bytes(b"\x08\x01")
    (d / "signature.txt").write_text(
        "input padded_pca f32 4,6,3\n"
        "input spectra f32 5,7\n"
        "output labels f32 4,6,3\n")
    np.save(tmp_path / "cube.npy", cube)
    np.save(tmp_path / "spectra.npy", spectra)
    out = tmp_path / "pred.npy"
    proc = subprocess.run(
        [host_bin, "--plugin", stub_plugin, "--bundle", str(d),
         "--cube", str(tmp_path / "cube.npy"),
         "--spectra", str(tmp_path / "spectra.npy"),
         "--out", str(out), "--repeat", "2",
         "--copt", "fake_opt=1", "--copt", "other=s"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    stats = json.loads(proc.stdout.strip())
    assert stats["repeat"] == 2 and stats["run_ms_min"] >= 0
    np.testing.assert_array_equal(np.load(out), cube)


def test_host_serve_mode_against_stub_plugin(host_bin, stub_plugin,
                                             tmp_path):
    """Warm --serve mode: two requests over stdin, one process."""
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = a * 2.0
    sp = np.zeros((2, 2), np.float32)
    d = tmp_path / "bundle"
    d.mkdir()
    (d / "module.stablehlo").write_bytes(b"x")
    (d / "compile_options.pb").write_bytes(b"y")
    (d / "signature.txt").write_text(
        "input padded_pca f32 3,4\ninput spectra f32 2,2\n"
        "output labels f32 3,4\n")
    for name, arr in [("a", a), ("b", b), ("sp", sp)]:
        np.save(tmp_path / f"{name}.npy", arr)
    # middle request is malformed (spectra where the cube should be):
    # the warm server must answer "error ..." and keep serving
    reqs = (f"{tmp_path}/a.npy {tmp_path}/sp.npy {tmp_path}/oa.npy\n"
            f"{tmp_path}/sp.npy {tmp_path}/sp.npy {tmp_path}/bad.npy\n"
            f"{tmp_path}/b.npy {tmp_path}/sp.npy {tmp_path}/ob.npy\n")
    proc = subprocess.run(
        [host_bin, "--plugin", stub_plugin, "--bundle", str(d), "--serve"],
        input=reqs, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.strip().splitlines()
    assert lines[0].startswith("ok ")
    assert lines[1].startswith("error ")
    assert lines[2].startswith("ok ")
    np.testing.assert_array_equal(np.load(tmp_path / "oa.npy"), a)
    np.testing.assert_array_equal(np.load(tmp_path / "ob.npy"), b)


def test_run_host_wrapper_against_stub(stub_plugin, tmp_path):
    """pjrt_launcher.run_host: build, invoke, parse the stats line."""
    from cmlpl_tpu.native.pjrt_launcher import run_host

    arr = np.ones((2, 3), np.float32)
    sp = np.zeros((1, 1), np.float32)
    d = tmp_path / "bundle"
    d.mkdir()
    (d / "module.stablehlo").write_bytes(b"m")
    (d / "compile_options.pb").write_bytes(b"c")
    (d / "signature.txt").write_text(
        "input padded_pca f32 2,3\ninput spectra f32 1,1\n"
        "output labels f32 2,3\n")
    np.save(tmp_path / "c.npy", arr)
    np.save(tmp_path / "s.npy", sp)
    stdout = run_host(str(d), str(tmp_path / "c.npy"),
                      str(tmp_path / "s.npy"), str(tmp_path / "o.npy"),
                      plugin=stub_plugin, repeat=1, timeout=120)
    stats = json.loads(stdout)
    assert stats["repeat"] == 1
    np.testing.assert_array_equal(np.load(tmp_path / "o.npy"), arr)


def test_train_bundle_native_host_stub(host_bin, stub_plugin, tmp_path,
                                       monkeypatch):
    """Native TRAINING through the real host binary: cli.export_model
    --train_bundle writes the whole-run program + inputs/, the host's
    generic --inputs/--outdir mode uploads all ~77 arrays (f32/i32/u32,
    scalars included), executes, and writes every output.  The stub's
    size-aware contract (out[i] := in[i % n]'s bytes zero-padded to the
    signature size, shapes from CMLPL_STUB_SIGNATURE) makes the full
    N-ary plumbing assertable without hardware; numerics are pinned
    hermetically by tests/test_export.py::test_run_export_matches_
    train_run and on hardware by scripts/native_train_ab.py."""
    from cmlpl_tpu.cli.export_model import main as export_main

    monkeypatch.chdir(tmp_path)
    export_main(["--dataID", "0", "--n_PC", "16", "--num_epochs", "2",
                 "--labeled_batch_size", "16", "--unlabeled_batch_size",
                 "16", "--num_unlabel", "64", "--val_batch_size", "256",
                 "--dropout", "0.5", "--train_bundle", "tbundle"])
    meta = json.load(open("tbundle/meta.json"))
    assert meta["kind"] == "train_run"
    assert meta["batches_per_epoch"] > 0

    # scalar state leaves (step, opt counts) serialize as rank-0 "-" and
    # must round-trip the host's signature parser exactly
    sig_lines = open("tbundle/signature.txt").read().strip().splitlines()
    assert any(l.endswith(" i32 -") for l in sig_lines)
    dump = subprocess.run([host_bin, "--dump_signature", "tbundle"],
                          capture_output=True, text=True, check=True)
    assert dump.stdout.strip().splitlines() == sig_lines

    os.makedirs("out")
    env = dict(os.environ, CMLPL_STUB_SIGNATURE=str(
        tmp_path / "tbundle" / "signature.txt"))
    proc = subprocess.run(
        [host_bin, "--plugin", stub_plugin, "--bundle", "tbundle",
         "--inputs", "tbundle/inputs", "--outdir", "out"],
        capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    stats = json.loads(proc.stdout.strip())
    assert stats["num_inputs"] == len(meta["input_names"])
    assert stats["num_outputs"] == len(meta["output_names"])

    names_in = meta["input_names"]
    for i, name in enumerate(meta["output_names"]):
        got = np.load(os.path.join("out", name + ".npy"))
        src = np.load(os.path.join("tbundle", "inputs",
                                   names_in[i % len(names_in)] + ".npy"))
        gb, sb = got.tobytes(), src.tobytes()
        n = min(len(gb), len(sb))
        assert gb[:n] == sb[:n], name
        assert not any(gb[n:]), name  # zero tail past the echoed bytes


def test_launcher_plumbing():
    plug = discover_plugin()
    # The image ships at least libtpu.so; discovery must find something.
    assert plug is None or os.path.exists(plug)
    opts = client_options("/opt/axon/libaxon_pjrt.so")
    kv = dict(o.split("=", 1) for o in opts[1::2])
    assert kv["rank"] == str(0xFFFF_FFFF)
    assert kv["topology"].endswith(":1x1x1")
    env = plugin_env("/opt/axon/libaxon_pjrt.so")
    assert env["AXON_POOL_SVC_OVERRIDE"]
    assert client_options("/x/libtpu.so") == []
