#!/usr/bin/env python3
"""Bench-regression gate (VERDICT r8 item 6): compare two bench JSONs
per query and exit nonzero on unexplained movers.

Usage: python3 tools/bench_diff.py <baseline.json> <candidate.json>
           [--threshold 1.5] [--floor 0.5] [--allow q_a,q_b]

Accepts either bench shape: the flat Bench output
({"metric":…,"queries":{…}}) or the driver's BENCH_rNN wrapper
({"parsed": {…}}). A query regresses when candidate/baseline exceeds
--threshold AND the candidate time exceeds --floor seconds (sub-floor
queries are scheduler-noise-dominated; a 0.1 s -> 0.2 s move is jitter,
not a plan change). Queries only in one file are reported informationally
(new/removed surface, never a failure). --allow names movers explained in
SURVEY (e.g. a deliberately heavier gate); each is reported as ALLOWED.
Dev-only tool, stdlib-only — the scriptable twin of PlanSweep for time
instead of plan shape.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' key (not a bench JSON)")
    return d["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("candidate")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5)
    ap.add_argument("--allow", default="")
    args = ap.parse_args()
    base, cand = load(args.baseline), load(args.candidate)
    allow = {q for q in args.allow.split(",") if q}

    common = sorted(set(base) & set(cand))
    new = sorted(set(cand) - set(base))
    gone = sorted(set(base) - set(cand))
    bad = []
    for q in common:
        b, c = base[q], cand[q]
        ratio = c / b if b > 0 else float("inf")
        if ratio > args.threshold and c > args.floor:
            tag = "ALLOWED" if q in allow else "REGRESSED"
            print(f"{tag} {q}: {b:.3f}s -> {c:.3f}s ({ratio:.2f}x)")
            if q not in allow:
                bad.append(q)
    for q in new:
        print(f"NEW      {q}: {cand[q]:.3f}s")
    for q in gone:
        print(f"REMOVED  {q} (was {base[q]:.3f}s)")
    tb = sum(base[q] for q in common)
    tc = sum(cand[q] for q in common)
    ratio = f"{tc / tb:.3f}x" if tb > 0 else "n/a"
    print(f"common {len(common)} queries: {tb:.1f}s -> {tc:.1f}s "
          f"({ratio}); {len(new)} new, {len(gone)} removed, "
          f"{len(bad)} regressed (> {args.threshold}x and > {args.floor}s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
