"""Compare two bench result files query-by-query.

Usage: python tools/bench_compare.py OLD NEW [--force]

Accepts either the driver's BENCH_r{N}.json wrapper (bench JSON embedded
in its "tail" field) or a raw bench.py output line saved to a file.
Prints per-query ratios (NEW/OLD) sorted worst-first, the shared-set
totals, and — when both files carry a calibration anchor — the
machine-normalized ratio, which is the number that means anything across
sessions (see PERF_NOTES.md: raw cross-session totals move ±15-25% on
identical code).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    m = re.search(r'\{"metric".*\}', d.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench JSON found")
    return json.loads(m.group(0))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    if not (old.get("calibration_sec") and new.get("calibration_sec")):
        missing = [p for p, d in zip(args, (old, new))
                   if not d.get("calibration_sec")]
        print(f"INCOMPARABLE (no calibration anchor in: "
              f"{', '.join(missing)}).")
        print("Rounds r01-r05 predate the calibration job; identical code "
              "measures ±15-25% apart between sessions (PERF_NOTES.md), so "
              "a raw-seconds verdict against them is noise, not a "
              "regression. Re-run both suites in one session for a real "
              "comparison, or pass --force to see the raw table anyway.")
        if not force:
            raise SystemExit(2)
    shared = [k for k in old["queries"] if k in new["queries"]]
    rows = sorted(
        shared,
        key=lambda k: new["queries"][k] / max(old["queries"][k], 1e-9),
        reverse=True,
    )
    for k in rows:
        o, n = old["queries"][k], new["queries"][k]
        print(f"{n / max(o, 1e-9):6.2f}x  {o:8.3f} -> {n:8.3f}  {k}")
    to, tn = (sum(d["queries"][k] for k in shared) for d in (old, new))
    print(f"\nshared-{len(shared)} total: {to:.2f} -> {tn:.2f} "
          f"({tn / max(to, 1e-9):.2f}x raw)")
    co, cn = old.get("calibration_sec"), new.get("calibration_sec")
    if co and cn:
        norm = (tn / cn) / (to / co)
        print(f"calibration: {co:.3f} -> {cn:.3f}; "
              f"machine-normalized ratio: {norm:.2f}x"
              f"  <- the ONLY cross-session number that means anything")
    else:
        print("(raw table shown under --force; no calibrated verdict)")


if __name__ == "__main__":
    main()
