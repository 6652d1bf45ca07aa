"""Compare two bench result files query-by-query.

Usage: python tools/bench_compare.py OLD NEW

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
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
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
              f"machine-normalized ratio: {norm:.2f}x")
    else:
        print("(no calibration anchor in one of the files — raw ratio "
              "only; treat ±25% as noise)")


if __name__ == "__main__":
    main()
