"""The round-2 evidence scripts: fetch_datasets + oa_parity.

The real cubes are not fetchable in a zero-egress container, so these
tests pin (a) the fetch plan's destinations/keys against the registry
(so a successful download verifies against the loader), (b) the
verify/refusal paths, and (c) the full oa_parity harness end-to-end on
the synthetic scene at a micro configuration.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import fetch_datasets  # noqa: E402
import oa_parity  # noqa: E402

from cmlpl_tpu.registry import get_dataset  # noqa: E402


def test_fetch_plan_matches_registry():
    """Every planned destination file is exactly what the loader opens."""
    for name, data_id in fetch_datasets.DATA_IDS.items():
        spec = get_dataset(data_id)
        dests = [fname for _, fname, _ in fetch_datasets.FETCH_PLAN[name]]
        assert dests == [spec.cube_file, spec.gt_file]


def test_fetch_verify_missing(tmp_path, capsys):
    assert not fetch_datasets.verify("paviau", str(tmp_path))
    assert "MISSING" in capsys.readouterr().out


def test_fetch_verify_real_shaped_file(tmp_path, rng):
    """A correctly-keyed tiny Indian Pines pair fails only on dims."""
    import scipy.io as sio

    spec = get_dataset(4)
    sio.savemat(os.path.join(tmp_path, spec.cube_file),
                {spec.cube_key: rng.normal(size=(5, 4, 3))})
    sio.savemat(os.path.join(tmp_path, spec.gt_file),
                {spec.gt_key: rng.integers(0, 3, size=(5, 4))})
    assert not fetch_datasets.verify("indian_pines", str(tmp_path))


def test_oa_parity_refuses_synthetic_fallback(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit) as e:
        oa_parity.run(["--dataID", "1", "--seeds", "1"])
    assert "fetch_datasets" in str(e.value)


def test_oa_parity_harness_end_to_end(capsys):
    result = oa_parity.run([
        "--dataID", "0", "--seeds", "2", "--n_PC", "8", "--w", "8",
        "--num_epochs", "1", "--labeled_batch_size", "8",
        "--unlabeled_batch_size", "8", "--num_unlabel", "16",
        "--val_batch_size", "128", "--dropout", "0.0"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed == result
    assert result["seeds"] == 2
    assert len(result["oa_net_b"]) == 2
    assert all(0.0 <= v <= 100.0 for v in result["oa_net_b"])
    assert np.isclose(result["mean_oa"],
                      round(float(np.mean(result["oa_net_b"])), 2),
                      atol=0.01)
    # synthetic scene: no parity verdict is ever emitted
    assert result["parity"] is None


@pytest.mark.parametrize("algo", ["cps", "cct"])
def test_oa_parity_algo_variants(algo):
    """--algo routes the harness through the CPS/CCT trainers (one
    command per algorithm the moment real data exists, VERDICT r2 #3);
    the 94.36 target stays CMLPL-only."""
    result = oa_parity.run([
        "--dataID", "0", "--algo", algo, "--seeds", "1", "--n_PC", "8",
        "--w", "8", "--num_epochs", "1", "--labeled_batch_size", "8",
        "--unlabeled_batch_size", "8", "--num_unlabel", "16",
        "--val_batch_size", "128", "--dropout", "0.0"])
    assert result["algo"] == algo
    assert len(result["oa_net_b"]) == 1
    assert len(result["oa_net_e"]) == (0 if algo == "cct" else 1)
    assert result["reference_oa"] is None and result["parity"] is None


def test_fetch_one_downloads_and_converts(tmp_path, rng):
    """fetch_one with a file:// URL exercises download + key conversion
    offline (the real run only swaps the URL scheme)."""
    import scipy.io as sio

    src = tmp_path / "Salinas_corrected.mat"
    X = rng.normal(size=(5, 4, 3))
    sio.savemat(str(src), {"salinas_corrected": X})
    dest = tmp_path / "salinas.mat"
    ok = fetch_datasets.fetch_one(src.as_uri(), str(dest),
                                  ("salinas_corrected", "HSI_original"))
    assert ok and dest.exists()
    np.testing.assert_allclose(sio.loadmat(str(dest))["HSI_original"], X)

    # no-convert path
    dest2 = tmp_path / "PaviaU.mat"
    ok = fetch_datasets.fetch_one(src.as_uri(), str(dest2), None)
    assert ok and dest2.exists()
