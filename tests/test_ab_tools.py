"""Guard rails on the A/B evidence tooling (r4 advisor findings).

The measurement harness is load-bearing for the parity claim, so its
failure modes are pinned like product code: partial-file resume must
refuse to mix OA distributions from different configurations, verdicts
must refuse n<2 sides instead of serializing NaN, ab_verdict must not
silently judge reference-vs-reference, and hw_session's relay waiter /
artifact gating must behave (the r4 round was lost to manual polling).
"""

import argparse
import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def oracle():
    return _load("reference_oracle")


@pytest.fixture(scope="module")
def ab_verdict():
    return _load("ab_verdict")


@pytest.fixture(scope="module")
def hw_session():
    return _load("hw_session")


def _args(**overrides):
    base = dict(seed0=1088, geometry="paviau", rows=64, cols=48,
                noise_std=1.2, class_sep=0.35, num_label=5,
                num_epochs=10, labeled_batch_size=64,
                unlabeled_batch_size=64, num_unlabel=2048, dropout=0.8,
                lr=5e-4, ours_flags=[])
    base.update(overrides)
    return argparse.Namespace(**base)


# --------------------------------------------------------------------- #
# partial-file fingerprinting
# --------------------------------------------------------------------- #
def test_partial_resume_round_trip(tmp_path, oracle):
    fp = oracle.config_fingerprint(_args(), "reference")
    p = str(tmp_path / "ref_x.partial.json")
    oracle.bank_partial(p, fp, [80.0, 81.0], [79.5, 80.5], [100.0, 99.0])
    oa_a, oa_b, secs = oracle.resume_partial(p, fp, "t")
    assert oa_a == [80.0, 81.0] and oa_b == [79.5, 80.5]
    assert secs == [100.0, 99.0]


def test_partial_refuses_config_mismatch(tmp_path, oracle):
    """A partial banked under one scene recipe must not resume under
    another — that would silently mix OA distributions (advisor, r4)."""
    p = str(tmp_path / "ref_x.partial.json")
    oracle.bank_partial(p, oracle.config_fingerprint(_args(), "reference"),
                        [80.0], [], [100.0])
    other = oracle.config_fingerprint(_args(seed0=2000), "reference")
    with pytest.raises(RuntimeError, match="different configuration"):
        oracle.resume_partial(p, other, "t")


def test_partial_ours_flags_in_fingerprint(tmp_path, oracle):
    """Knob A/Bs (--ours_flags) are distinct configurations: a bf16 run
    must not resume an f32 partial."""
    p = str(tmp_path / "ours_x.partial.json")
    f32 = oracle.config_fingerprint(_args(), "ours")
    bf16 = oracle.config_fingerprint(
        _args(ours_flags=["--compute_dtype", "bfloat16"]), "ours")
    assert f32 != bf16
    # platform is provenance too: a TPU session must not extend a
    # CPU-banked ours partial
    tpu = oracle.config_fingerprint(_args(ours_tpu=True), "ours")
    assert tpu != f32 and tpu["ours_tpu"] is True
    oracle.bank_partial(p, f32, [80.0], [], [10.0])
    with pytest.raises(RuntimeError):
        oracle.resume_partial(p, bf16, "t")


def test_partial_legacy_resumes_with_warning(tmp_path, oracle, capsys):
    """Pre-fingerprint partials (r3/r4 banks) still resume."""
    p = str(tmp_path / "ref_x.partial.json")
    with open(p, "w") as f:
        json.dump({"oa_a": [80.0], "oa_b": [], "sec_per_seed": [9.0]}, f)
    oa_a, _, _ = oracle.resume_partial(
        p, oracle.config_fingerprint(_args(), "reference"), "t")
    assert oa_a == [80.0]
    assert "legacy partial" in capsys.readouterr().err


# --------------------------------------------------------------------- #
# verdict small-n guard
# --------------------------------------------------------------------- #
def test_verdict_refuses_single_seed_side(oracle):
    v = oracle.verdict({"oa_a": [80.0, 81.0], "oa_b": [79.0, 80.0]},
                       {"oa_a": [80.5], "oa_b": []})
    assert v["overlapping"] is None and "error" in v
    json.dumps(v)  # must serialize (the NaN path did not, RFC-wise)


def test_verdict_normal_path_unchanged(oracle):
    v = oracle.verdict({"oa_a": [80.0, 81.0], "oa_b": [79.0, 80.0]},
                       {"oa_a": [80.2, 80.8], "oa_b": [79.9, 80.1]})
    assert v["overlapping"] is True and v["band"] >= 1.0


# --------------------------------------------------------------------- #
# ab_verdict CLI guards
# --------------------------------------------------------------------- #
def test_ab_verdict_refuses_cross_side_fallback(tmp_path, ab_verdict):
    bank = tmp_path / "bank.json"
    with open(bank, "w") as f:
        json.dump({"cmlpl": {"reference": {"oa_a": [80.0, 81.0],
                                           "oa_b": []}}}, f)
    with pytest.raises(SystemExit, match="no 'ours' entry"):
        ab_verdict.main(["--algo", "cmlpl", "--ref", str(bank),
                         "--ours", str(bank)])


def test_ab_verdict_refuses_one_seed(tmp_path, ab_verdict):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    with open(ref, "w") as f:
        json.dump({"oa_a": [80.0, 81.0], "oa_b": []}, f)
    with open(ours, "w") as f:
        json.dump({"oa_a": [80.0], "oa_b": []}, f)
    with pytest.raises(SystemExit, match="needs >=2 per side"):
        ab_verdict.main(["--algo", "cmlpl", "--ref", str(ref),
                         "--ours", str(ours)])


def test_ab_verdict_happy_path(tmp_path, ab_verdict):
    ref = tmp_path / "ref.json"
    ours = tmp_path / "ours.json"
    with open(ref, "w") as f:
        json.dump({"cmlpl": {"reference": {"oa_a": [80.0, 81.0],
                                           "oa_b": [79.0, 80.0]}}}, f)
    with open(ours, "w") as f:
        json.dump({"oa_a": [80.2, 80.9], "oa_b": [79.8, 80.3]}, f)
    out = tmp_path / "ab.json"
    entry = ab_verdict.main(["--algo", "cmlpl", "--ref", str(ref),
                             "--ours", str(ours), "--out", str(out)])
    assert entry["n_ref"] == 4 and entry["n_ours"] == 4
    assert entry["verdict"]["overlapping"] is True
    # the output is consumable by the tool again (A/B layout)
    again = ab_verdict._load_side(str(out), "cmlpl", "ours")
    assert again["oa_a"] == [80.2, 80.9]


# --------------------------------------------------------------------- #
# hw_session relay waiter + artifact gating
# --------------------------------------------------------------------- #
def test_wait_for_relay_returns_when_reachable(hw_session, monkeypatch):
    monkeypatch.setattr(hw_session, "relay_reachable", lambda **k: True)
    monkeypatch.setattr(hw_session.time, "sleep", lambda *_: None)
    assert hw_session.wait_for_relay(0.01, poll_sec=1.0) is True


def test_wait_for_relay_budget_exhausts(hw_session, monkeypatch):
    monkeypatch.setattr(hw_session, "relay_reachable", lambda **k: False)
    monkeypatch.setattr(hw_session.time, "sleep", lambda *_: None)
    assert hw_session.wait_for_relay(1e-7, poll_sec=0.0) is False


def test_wait_for_relay_flap_needs_two_polls(hw_session, monkeypatch):
    """One reachable poll followed by a drop must not start the session
    (observed: the relay flaps during outages)."""
    seen = iter([True, False, True, True])
    monkeypatch.setattr(hw_session, "relay_reachable",
                        lambda **k: next(seen))
    monkeypatch.setattr(hw_session.time, "sleep", lambda *_: None)
    assert hw_session.wait_for_relay(0.01, poll_sec=0.0) is True


def test_hw_session_skips_items_missing_requirements(
        hw_session, monkeypatch, tmp_path):
    """An item whose input artifact (e.g. the Salinas reference bank) is
    still being produced is skipped with a note, not run to failure."""
    monkeypatch.setattr(hw_session, "relay_reachable", lambda **k: True)
    monkeypatch.setattr(hw_session, "require_tunnel", lambda: None)
    monkeypatch.setattr(hw_session, "ITEMS", [
        ("gated", [sys.executable, "-c", "print('ran')"], 60),
    ])
    monkeypatch.setattr(hw_session, "REQUIRES",
                        {"gated": "docs/does_not_exist_r5.json"})
    out = str(tmp_path / "session.json")
    session = hw_session.main(["--out", out])
    status = session["items"]["gated"]["status"]
    assert status.startswith("skipped (missing")
    assert json.load(open(out))["items"]["gated"]["status"] == status


def test_hw_session_runs_item_when_requirement_present(
        hw_session, monkeypatch, tmp_path):
    monkeypatch.setattr(hw_session, "relay_reachable", lambda **k: True)
    monkeypatch.setattr(hw_session, "require_tunnel", lambda: None)
    monkeypatch.setattr(hw_session, "ITEMS", [
        ("free", [sys.executable, "-c", "print('ran')"], 60),
    ])
    monkeypatch.setattr(hw_session, "REQUIRES", {})
    session = hw_session.main(["--out", str(tmp_path / "s.json")])
    assert session["items"]["free"]["status"] == "ok"
    assert "ran" in session["items"]["free"]["stdout"]


def test_hw_session_marks_mid_session_relay_drop(
        hw_session, monkeypatch, tmp_path):
    """Without a wait budget, a dead relay marks items instead of
    burning each subprocess timeout hanging in the claim-retry loop."""
    monkeypatch.setattr(hw_session, "relay_reachable", lambda **k: False)
    monkeypatch.setattr(hw_session, "require_tunnel", lambda: None)
    monkeypatch.setattr(hw_session, "ITEMS", [
        ("a", [sys.executable, "-c", "print('x')"], 60),
        ("b", [sys.executable, "-c", "print('y')"], 60),
    ])
    session = hw_session.main(["--out", str(tmp_path / "s.json")])
    assert all(v["status"] == "relay dropped mid-session"
               for v in session["items"].values())
