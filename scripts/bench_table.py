#!/usr/bin/env python3
"""Rebuild PLANS.md's bench-variance table from two (or more) sessions'
`target/bench_stats.json` snapshots (copy each session's file aside before
the next run overwrites it).

Usage: python3 scripts/bench_table.py statsA.json statsB.json [...]

Per query, prints min-of-session-mins, the better session's median, and
max-of-maxes — the same estimator family the CLAUDE.md protocol
prescribes (min = contention-immune plan cost; the spread shows noise).
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sessions = []
    for p in sys.argv[1:]:
        with open(p) as f:
            sessions.append(json.load(f))
    runs = sum(s.get("runs_per_query", 3) for s in sessions)
    names = sorted(sessions[0]["stats"].keys())
    for s in sessions[1:]:
        if sorted(s["stats"].keys()) != names:
            sys.exit("sessions cover different query sets — same code required")
    print("| query | min | median | max | runs |")
    print("|---|---|---|---|---|")
    total = 0.0
    for n in names:
        per = [s["stats"][n] for s in sessions]
        mn = min(p["min"] for p in per)
        # median of the session whose min won (its runs were cleanest)
        med = min(per, key=lambda p: p["min"])["median"]
        mx = max(p["max"] for p in per)
        total += mn
        print(f"| {n} | {mn:.2f} | {med:.2f} | {mx:.2f} | {runs} |")
    print(f"\nmin-of-session-mins total: {total:.1f} s for {len(names)} queries")


if __name__ == "__main__":
    main()
