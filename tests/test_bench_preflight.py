"""bench.py relay-outage behaviour: the preflight must emit one
parseable JSON line carrying the last banked result instead of hanging
in the axon plugin's claim-retry loop (outages recorded in CLAUDE.md;
BENCH_r03.json was lost to one)."""

import json

import pytest

import bench


def test_preflight_emits_last_known_when_relay_down(tmp_path, capsys,
                                                    monkeypatch):
    banked = {"metric": "cmlpl_train_patches_per_sec_per_chip",
              "value": 123456.0, "unit": "patches/s/chip"}
    last = tmp_path / "bench_last.json"
    monkeypatch.setattr(bench, "LAST_RESULT_PATH", str(last))
    bench._bank_result(banked)
    saved = json.loads(last.read_text())
    assert saved["value"] == 123456.0
    assert "measured_utc" in saved  # stamped at bank time

    from cmlpl_tpu.utils import tunnel
    monkeypatch.setattr(tunnel, "relay_reachable", lambda: False)
    with pytest.raises(SystemExit) as exc:
        bench._tunnel_preflight()
    assert exc.value.code == 1
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] is None          # nothing measured NOW
    assert "unreachable" in line["error"]
    assert line["last_known"]["value"] == 123456.0


def test_preflight_without_bank_still_parseable(tmp_path, capsys,
                                                monkeypatch):
    monkeypatch.setattr(bench, "LAST_RESULT_PATH",
                        str(tmp_path / "missing.json"))
    from cmlpl_tpu.utils import tunnel
    monkeypatch.setattr(tunnel, "relay_reachable", lambda: False)
    with pytest.raises(SystemExit):
        bench._tunnel_preflight()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] is None
    assert "last_known" not in line


def test_committed_bank_is_loadable():
    """docs/bench_last.json ships in-repo (seeded from the recorded
    2026-08-17 run) so a round-end relay outage still surfaces a real
    number; it must stay parseable and structurally bench-shaped."""
    with open(bench.LAST_RESULT_PATH) as f:
        saved = json.load(f)
    assert saved["metric"] == "cmlpl_train_patches_per_sec_per_chip"
    assert saved["value"] and saved["value"] > 0
    assert "measured_utc" in saved
