"""Compute the reference-vs-ours OA verdict from banked seed files.

scripts/reference_oracle.py banks every finished seed incrementally
(``ref_<algo>.partial.json`` / ``ours_<algo>.partial.json``) but only
writes its verdict JSON after ALL requested seeds complete.  On this
host, multi-hour CPU runs get cut short (relay outages, session ends,
host reboots — CLAUDE.md outage log), so the seeds that DID land must
still be judgeable.  This tool reproduces reference_oracle.verdict()
from any combination of:

  - a per-algo reference bank (docs/<algo>_ref_seeds_r4.json layout:
    {"<algo>": {"reference": {...}}}) or a raw partial
    ({"oa_a": [...], "oa_b": [...]})
  - an ours-side partial or a prior A/B output
    ({"<algo>": {"ours": {...}}})

Usage:
  python scripts/ab_verdict.py --algo cct \
      --ref docs/cct_ref_seeds_r4.json \
      --ours /tmp/cct_ab_cpu/ours_cct.partial.json \
      [--out docs/cct_ab_r4_cpu.json] [--note "..."]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_side(path: str, algo: str, side: str) -> dict:
    """Accept a raw partial ({oa_a, oa_b, ...}) or a nested A/B / bank
    file ({algo: {side: {...}}})."""
    with open(path) as f:
        d = json.load(f)
    if "oa_a" in d:
        return d
    entry = d[algo]
    if side not in entry:
        # no cross-side fallback: passing a reference bank as --ours
        # would otherwise silently judge reference-vs-reference
        # (always-overlapping) instead of erroring (advisor, r4)
        raise SystemExit(
            f"{path} holds no '{side}' entry for algo '{algo}' "
            f"(keys: {sorted(entry)}); pass the file that actually "
            f"carries the {side}-side OA values")
    return entry[side]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algo", required=True,
                   choices=["cmlpl", "cps", "cct"])
    p.add_argument("--ref", required=True,
                   help="reference bank / partial / prior A/B JSON")
    p.add_argument("--ours", required=True,
                   help="ours-side partial / prior A/B JSON")
    p.add_argument("--out", default=None,
                   help="optional output JSON (A/B layout, consumable "
                        "by this tool again)")
    p.add_argument("--note", default=None)
    args = p.parse_args(argv)

    spec = importlib.util.spec_from_file_location(
        "reference_oracle",
        os.path.join(_REPO, "scripts", "reference_oracle.py"))
    oracle = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oracle)

    ref = _load_side(args.ref, args.algo, "reference")
    ours = _load_side(args.ours, args.algo, "ours")
    for name, side in (("ref", ref), ("ours", ours)):
        n = len(side["oa_a"]) + len(side.get("oa_b") or [])
        if n < 2:
            raise SystemExit(
                f"--{name} side has only {n} OA value(s); a verdict "
                f"needs >=2 per side (se is undefined at n=1)")
    entry = {
        "algo": args.algo,
        "reference": dict(ref, recorded_from=args.ref),
        "ours": dict(ours, recorded_from=args.ours),
        "n_ref": len(ref["oa_a"]) + len(ref.get("oa_b") or []),
        "n_ours": len(ours["oa_a"]) + len(ours.get("oa_b") or []),
        "verdict": oracle.verdict(ref, ours),
    }
    if args.note:
        entry["_note"] = args.note
    print(json.dumps({k: entry[k] for k in
                      ("algo", "n_ref", "n_ours", "verdict")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({args.algo: entry}, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)
    return entry


if __name__ == "__main__":
    main()
