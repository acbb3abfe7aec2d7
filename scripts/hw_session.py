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

from cmlpl_tpu.utils.tunnel import require_tunnel  # noqa: E402

ITEMS = [
    # bench FIRST: it is the driver-facing headline and the number the
    # r3 mid-session relay drop actually lost (BENCH_r03.json null); if
    # the window is short, bank it before anything else
    ("bench",
     [sys.executable, "bench.py"],
     1800),
    ("native_serve_ab",
     [sys.executable, "scripts/native_serve_ab.py", "--repeats", "3"],
     1800),
    ("native_train_ab",
     [sys.executable, "scripts/native_train_ab.py", "--num_epochs", "5"],
     3600),
    ("ab_multi_run",
     [sys.executable, "scripts/ab_multi_run.py"],
     2400),
    ("ab_noise",
     [sys.executable, "scripts/ab_noise.py", "--rounds", "3"],
     3600),
    # ours-side CCT seeds vs the banked 12-seed reference distribution
    # (VERDICT r3 item 7).  On TPU a seed is ~10 s vs ~10 min on this
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[],
                   choices=[name for name, _, _ in ITEMS])
    p.add_argument("--out", type=str,
                   default="docs/hw_session_latest.json")
    args = p.parse_args(argv)

    require_tunnel()  # fail in seconds, not hang, if the relay is down

    session = {"started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime()),
               "items": {}}
    for name, cmd, timeout in ITEMS:
        if name in args.skip:
            session["items"][name] = {"status": "skipped"}
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
