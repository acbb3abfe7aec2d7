"""One-command hardware session: run every TPU-pending measurement.

TPU access in this environment comes and goes with the axon tunnel
relay (outages recorded in CLAUDE.md); when the chip is back, the
window may be short.  This orchestrator spends it efficiently: it runs
each pending hardware item as a bounded subprocess, captures stdout,
and writes one session log, so a single command banks every number.

Items (skip any with --skip, add repeats where supported):
  1. bench            — headline bench.py FIRST (the number the r3
                        mid-session relay drop lost); also refreshes
                        docs/bench_last.json for the driver preflight
  2. native_serve_ab  — C++ PJRT host vs in-process predictor, bit-exact
  3. native_train_ab  — C++ host runs the WHOLE training run, bit-exact
  4. ab_multi_run     — fused multi-seed dispatch vs serial loop
  5. ab_noise         — noise-view knob A/B, interleaved (VERDICT r3 #4)
  6. profile_fast_stack — perfetto trace of the pool+rbg+bf16 stack

Usage:
    python scripts/hw_session.py                 # all items
    python scripts/hw_session.py --skip bench    # subset
    python scripts/hw_session.py --out docs/hw_session_r3f.json
    python scripts/hw_session.py --wait_relay 11 # poll until the relay
                                                 # returns (<=11 h), then
                                                 # run everything

--wait_relay exists because manual polling already lost a full round:
the r4 builder checked the relay every 17 minutes and never caught a
window (VERDICT r4 item 1).  Start this in the background at the top of
every session; if the relay comes back for even half an hour, bench and
the highest-priority A/Bs bank themselves.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cmlpl_tpu.utils.tunnel import (  # noqa: E402
    relay_address, relay_reachable, require_tunnel)

ITEMS = [
    # bench FIRST: it is the driver-facing headline and the number the
    # r3 mid-session relay drop actually lost (BENCH_r03.json null); if
    # the window is short, bank it before anything else
    ("bench",
     [sys.executable, "bench.py"],
     1800),
    # the 12-seed ours-on-TPU A/Bs come right after bench (VERDICT r4
    # item 1 priority order): the parity verdict's ±4.8 band is the
    # biggest proof gap after the headline number, the seeds are cheap
    # on TPU (~10-70 s each), and the per-seed partial banking degrades
    # gracefully if the relay drops mid-item.  One-shot items (native
    # A/Bs, profiles) run after.
    #
    # ours-side CCT seeds vs the banked 12-seed reference distribution
    # (VERDICT r3 item 7).  On TPU a seed is ~10 s vs ~40 min on this
    # 1-vCPU CPU (the r4 CPU fallback run); if the CPU run already
    # produced docs/cct_ab_r4.json this recomputes on TPU in under two
    # minutes anyway — same analysis, separate workdir/provenance.
    ("cct_ab_tpu",
     [sys.executable, "scripts/reference_oracle.py", "--algos", "cct",
      "--seeds", "12", "--skip_ref",
      "--ref_json", "docs/cct_ref_seeds_r4.json", "--ours_tpu",
      "--workdir", "/tmp/cct_ab_tpu",
      "--out", os.path.join(REPO, "docs", "cct_ab_r4_tpu.json")],
     3600),
    # same for cmlpl + cps against the r4 reference-side banks (seeded
    # from the r3 n=3 run; the CPU-torch extension run appends seeds as
    # it banks them — ours n may exceed ref n, which the verdict's
    # per-side SE handles)
    ("cmlpl_ab_tpu",
     [sys.executable, "scripts/reference_oracle.py", "--algos", "cmlpl",
      "--seeds", "12", "--skip_ref",
      "--ref_json", "docs/cmlpl_ref_seeds_r4.json", "--ours_tpu",
      "--workdir", "/tmp/cmlpl_ab_tpu",
      "--out", os.path.join(REPO, "docs", "cmlpl_ab_r4_tpu.json")],
     3600),
    ("cps_ab_tpu",
     [sys.executable, "scripts/reference_oracle.py", "--algos", "cps",
      "--seeds", "12", "--skip_ref",
      "--ref_json", "docs/cps_ref_seeds_r4.json", "--ours_tpu",
      "--workdir", "/tmp/cps_ab_tpu",
      "--out", os.path.join(REPO, "docs", "cps_ab_r4_tpu.json")],
     3600),
    ("ab_noise",
     [sys.executable, "scripts/ab_noise.py", "--rounds", "3"],
     3600),
    ("native_serve_ab",
     [sys.executable, "scripts/native_serve_ab.py", "--repeats", "3"],
     1800),
    ("native_train_ab",
     [sys.executable, "scripts/native_train_ab.py", "--num_epochs", "5"],
     3600),
    ("ab_multi_run",
     [sys.executable, "scripts/ab_multi_run.py"],
     2400),
    # second-geometry A/B (VERDICT r4 item 7): ours-on-TPU cmlpl seeds at
    # the Salinas geometry (16 classes x 204 bands, reference dataID-2
    # path, hyper_tools.py:250-276) against the r5 CPU-torch reference
    # bank.  Runs only once that bank exists (the CPU run producing it
    # may still be in flight when the relay returns).
    ("salinas_ab_tpu",
     [sys.executable, "scripts/reference_oracle.py", "--algos", "cmlpl",
      "--geometry", "salinas", "--seeds", "8", "--skip_ref",
      "--ref_json", "docs/cmlpl_salinas_ref_seeds_r5.json", "--ours_tpu",
      "--workdir", "/tmp/salinas_ab_tpu",
      "--out", os.path.join(REPO, "docs", "cmlpl_ab_salinas_r5.json")],
     3600),
    # fresh perfetto trace of the fast stack (pool+rbg+bf16) — the r3
    # trace that guides conv-side work was f32-pool; capture the bf16
    # breakdown so the next conv lever is chosen from evidence
    ("profile_fast_stack",
     [sys.executable, "-c",
      "from cmlpl_tpu.cli.train import main; main(["
      "'--dataID','1','--num_epochs','2','--rng_impl','rbg',"
      "'--compute_dtype','bfloat16',"
      "'--profile_dir','docs/profiles/r4_fast'])"],
     2400),
]


#: items that consume an artifact another (possibly still-running) job
#: produces; skipped with a note instead of failing when it is absent
REQUIRES = {
    "salinas_ab_tpu": "docs/cmlpl_salinas_ref_seeds_r5.json",
}


def wait_for_relay(max_hours: float, poll_sec: float) -> bool:
    """Block until the relay accepts connections (True) or the budget
    runs out (False).  Requires two reachable polls ``poll-stability``
    apart so a flapping relay doesn't trigger a doomed session."""
    host, port = relay_address()
    deadline = time.time() + max_hours * 3600.0
    n = 0
    while time.time() < deadline:
        if relay_reachable(timeout=5.0):
            time.sleep(10.0)  # stability re-check: outages have flapped
            if relay_reachable(timeout=5.0):
                print(f"[wait_relay] {host}:{port} reachable after "
                      f"{n} polls — starting the session", flush=True)
                return True
        n += 1
        if n % 12 == 1:  # ~hourly at the 5-min default
            left = (deadline - time.time()) / 3600.0
            print(f"[wait_relay] {host}:{port} still down "
                  f"(poll {n}, {left:.1f} h left)", flush=True)
        time.sleep(min(poll_sec, max(0.0, deadline - time.time())))
    return False


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[],
                   choices=[name for name, _, _ in ITEMS])
    p.add_argument("--out", type=str,
                   default="docs/hw_session_latest.json")
    p.add_argument("--wait_relay", type=float, default=None,
                   metavar="HOURS",
                   help="poll the relay until it accepts connections "
                        "(up to HOURS), then run the items; without it "
                        "a down relay fails immediately")
    p.add_argument("--poll_sec", type=float, default=300.0)
    args = p.parse_args(argv)

    if args.wait_relay is not None:
        if not wait_for_relay(args.wait_relay, args.poll_sec):
            _write(args.out, {
                "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime()),
                "relay": "never returned within "
                         f"{args.wait_relay} h of polling",
                "items": {}})
            print(f"[wait_relay] budget exhausted "
                  f"({args.wait_relay} h); relay never returned",
                  flush=True)
            return None

    require_tunnel()  # fail in seconds, not hang, if the relay is down

    session = {"started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime()),
               "items": {}}
    # overall budget for mid-session re-waits: the relay has died
    # mid-session before (r3 bench loss); a drop between items should
    # resume polling, not burn each remaining item's subprocess timeout
    # hanging in the claim-retry loop
    session_deadline = (time.time() + args.wait_relay * 3600.0
                        if args.wait_relay is not None else None)
    for name, cmd, timeout in ITEMS:
        if name in args.skip:
            session["items"][name] = {"status": "skipped"}
            continue
        if not relay_reachable(timeout=5.0):
            left_h = ((session_deadline - time.time()) / 3600.0
                      if session_deadline else 0.0)
            if left_h <= 0 or not wait_for_relay(left_h, args.poll_sec):
                session["items"][name] = {
                    "status": "relay dropped mid-session"}
                _write(args.out, session)
                continue
        req = REQUIRES.get(name)
        if req and not os.path.exists(os.path.join(REPO, req)):
            session["items"][name] = {
                "status": f"skipped (missing {req} — the CPU run "
                          "producing it had not finished)"}
            _write(args.out, session)
            continue
        print(f"=== {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(cmd, cwd=REPO, capture_output=True,
                               text=True, timeout=timeout)
            status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
            out, err = r.stdout, r.stderr
        except subprocess.TimeoutExpired as e:
            status = f"timeout>{timeout}s"
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(
                e.stderr, bytes) else (e.stderr or "")
        session["items"][name] = {
            "status": status,
            "wall_s": round(time.time() - t0, 1),
            "stdout": out[-8000:],
            "stderr_tail": err[-2000:],
        }
        print(out[-2000:], flush=True)
        print(f"=== {name}: {status} "
              f"({session['items'][name]['wall_s']} s)", flush=True)
        # bank incrementally: the relay has died mid-session before
        # (CLAUDE.md outage log); items already measured must survive
        _write(args.out, session)

    _write(args.out, session)
    print(f"session log -> {args.out}")
    return session


def _write(out_path: str, session: dict) -> None:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(session, f, indent=1)
    os.replace(tmp, out_path)


if __name__ == "__main__":
    main()
