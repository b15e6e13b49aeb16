#!/usr/bin/env python3
"""Per-query bench trend guard: compare two BENCH_r*.json artifacts and
flag regressions, so round-over-round slowdowns surface without a judge
re-run.

Usage: python3 scripts/bench_trend.py <old_bench.json> <new_bench.json>
       python3 scripts/bench_trend.py            # newest two in repo root

A query is flagged when new >= THRESH x old AND the absolute delta
exceeds ABS_FLOOR (sub-100ms wobble on cheap queries is noise, not
regression). New/removed queries are listed informationally. Exit code
1 when any regression is flagged, so the round notes can't forget it.
"""
import glob
import json
import os
import re
import sys

THRESH = 1.5
ABS_FLOOR = 0.1  # seconds


def load(path):
    """Accept either Bench's raw one-line JSON or a driver-side artifact
    (whose 'parsed' field — or failing that its 'tail' stdout capture —
    carries the bench line)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    # Since r7 Bench prints TWO lines (per-query dict on the penultimate
    # line, bounded total-only JSON last) so the driver's 2000-char tail
    # can't lose the total; scan every '{"metric"' candidate, newest
    # first, for one that parses AND carries the per-query map.
    tail = d.get("tail", "")
    for i in reversed([m.start() for m in re.finditer(r'\{"metric"', tail)]):
        line = tail[i:].splitlines()[0]
        try:
            bench = json.loads(line)
        except json.JSONDecodeError:
            continue  # head-truncated capture of a long line
        if "queries" in bench:
            return bench
    raise SystemExit(f"no bench JSON with a 'queries' map found in {path} "
                     "(truncated driver tail? use the committed "
                     "BENCH_r*_builder.json for per-query data)")


def main():
    if len(sys.argv) >= 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        rounds = sorted(glob.glob("BENCH_r*.json"),
                        key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if len(rounds) < 2:
            raise SystemExit("need two BENCH_r*.json files (or pass paths)")
        old_p, new_p = rounds[-2], rounds[-1]
    old, new = load(old_p), load(new_p)
    oq, nq = old["queries"], new["queries"]

    flagged, improved = [], []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            continue  # failed marker
        if b >= a * THRESH and b - a >= ABS_FLOOR:
            flagged.append((name, a, b, b / a))
        elif a >= b * THRESH and a - b >= ABS_FLOOR:
            improved.append((name, a, b, b / a))

    print(f"old: {os.path.basename(old_p)} total={old.get('value')}s "
          f"({len(oq)} queries)")
    print(f"new: {os.path.basename(new_p)} total={new.get('value')}s "
          f"({len(nq)} queries)")
    for name in sorted(set(nq) - set(oq)):
        print(f"  NEW      {name}: {nq[name]:.3f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  REMOVED  {name} (was {oq[name]:.3f}s)")
    for name, a, b, r in sorted(improved, key=lambda x: x[3]):
        print(f"  faster   {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
    if flagged:
        print(f"\n== {len(flagged)} REGRESSION(S) >= {THRESH}x ==")
        for name, a, b, r in sorted(flagged, key=lambda x: -x[3]):
            print(f"  REGRESSED {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
        sys.exit(1)
    print(f"\n== no per-query regression >= {THRESH}x (abs floor {ABS_FLOOR}s) ==")


if __name__ == "__main__":
    main()
