#!/usr/bin/env python3
"""DegenGate: degenerate-corpus totality sweep (VERDICT r10 item 1).

q_adamic_adar hid a plan-shape-dependent ANSI landmine for ten rounds
because every gate ran on HEALTHY data; this gate runs the FULL registry
+ the DuckDB oracle over adversarial corpora built by
graft.tools.DegenCorpus (empty / single / constant / hollow — see its
scaladoc) and requires, per (corpus, query), EITHER a full oracle
hash-match OR a documented expectation from tools/degen_expect.json:

  kind "error":    the query legitimately has no answer on this corpus
                   (e.g. training a model on zero rows, probing an
                   empty index) — the Spark side must RAISE (no output
                   written), and the reason documents why that is a
                   domain error rather than a defect.
  kind "mismatch": both engines compute, but the value legitimately
                   diverges on this corpus (e.g. tie-storms where the
                   spec pins no order) — the reason documents why.

A query that PASSES while carrying an expectation fails the gate as a
STALE expectation (the file must stay tight), and any undocumented
failure fails it outright. Exit 0 only when every cell is green.

Usage:
  python3 tools/degen_gate.py [--root /tmp/graft_degen]
      [--corpora empty,single,constant,hollow] [--only q_a,q_b]
      [--skip-verify]   # reuse existing Verify output dirs

Dev-only tool — not part of the library. Requires the corpora to exist
(run: sbt "runMain graft.tools.DegenCorpus /root/testdata/sf0.001
/tmp/graft_degen").
"""
import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# Default = the corpora the gate REQUIRES green — all four since r11:
# the hollow (alternating NULL / empty-value) tail was closed at
# 337 hash-matches + 25 documented expectations (SURVEY §23).
DEFAULT_CORPORA = ["empty", "single", "constant", "hollow"]
ALL_CORPORA = DEFAULT_CORPORA


def run_verify(corpus_dir: Path, out_dir: Path, only):
    # clear stale outputs first: Verify writes nothing for a query that
    # RAISES, so a leftover parquet dir from an earlier sweep would make
    # a now-erroring query look computed (and a kind-"error" expectation
    # look stale) — exactly the gate's own failure mode
    if out_dir.exists():
        import shutil
        for child in out_dir.iterdir():
            if child.is_dir() and (not only or child.name in only):
                shutil.rmtree(child)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    if only:
        env["SPARK_GRAFT_VERIFY_ONLY"] = ",".join(only)
    cmd = ["sbt", "-batch", f"runMain graft.Verify {corpus_dir} {out_dir}"]
    p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=7200)
    errs = {}
    for line in (p.stdout + p.stderr).splitlines():
        m = re.match(r"\[verify\] (\S+) failed: (.*)", line.strip())
        if m:
            errs[m.group(1)] = m.group(2)[:200]
    if p.returncode != 0:
        print(f"[degen-gate] WARNING verify exited {p.returncode}")
    return errs


def run_compare(corpus_dir: Path, out_dir: Path):
    p = subprocess.run(
        [sys.executable, str(REPO / "tools/compare.py"),
         str(corpus_dir), str(out_dir)],
        capture_output=True, text=True, timeout=3600)
    results = {}
    for line in p.stdout.splitlines():
        m = re.match(r"PASS (\S+) ", line)
        if m:
            results[m.group(1)] = ("pass", "")
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            results[m.group(1)] = ("fail", m.group(2))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/graft_degen")
    ap.add_argument("--out-root", default="/tmp/graft_degen_out")
    ap.add_argument("--corpora", default=",".join(DEFAULT_CORPORA))
    ap.add_argument("--only", default="")
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()
    corpora = [c for c in args.corpora.split(",") if c]
    only = [q for q in args.only.split(",") if q]
    expect_path = REPO / "tools/degen_expect.json"
    expect = (json.loads(expect_path.read_text())
              if expect_path.exists() else {})

    total_bad = 0
    summary = {}
    for corpus in corpora:
        cdir = Path(args.root) / corpus
        if not cdir.exists():
            print(f"[degen-gate] missing corpus {cdir} — run DegenCorpus")
            sys.exit(2)
        odir = Path(args.out_root) / corpus
        if not args.skip_verify:
            print(f"[degen-gate] verify sweep on {corpus} ...",
                  flush=True)
            run_verify(cdir, odir, only)
        results = run_compare(cdir, odir)
        # compare.py dying mid-run must not silently shrink the sweep:
        # every oracle the Verify run dumped metadata for is owed a verdict
        oracle_file = odir / "oracle_sql.json"
        if oracle_file.exists():
            for q in json.loads(oracle_file.read_text()):
                results.setdefault(q, ("fail", "no compare verdict "
                                       "(compare.py crashed earlier?)"))
        if only:
            results = {q: r for q, r in results.items() if q in only}
        n_ok = n_allowed = n_bad = n_stale = 0
        for q in sorted(results):
            status, detail = results[q]
            exp = expect.get(q, {}).get(corpus)
            if status == "pass":
                if exp:
                    print(f"[degen-gate] {corpus:9s} {q}: STALE "
                          f"expectation ({exp.get('kind')}) — it passes")
                    n_stale += 1
                else:
                    n_ok += 1
            else:
                crashed = detail.startswith("no spark output")
                if exp and exp.get("kind") == "error" and crashed:
                    n_allowed += 1
                elif exp and exp.get("kind") == "mismatch" and not crashed:
                    n_allowed += 1
                else:
                    print(f"[degen-gate] {corpus:9s} {q}: {detail[:160]}")
                    n_bad += 1
        summary[corpus] = (n_ok, n_allowed, n_bad, n_stale, len(results))
        total_bad += n_bad + n_stale

    print(f"\n[degen-gate] {'corpus':9s} {'ok':>5s} {'allowed':>8s} "
          f"{'bad':>5s} {'stale':>6s} {'total':>6s}")
    for c, (ok, al, bad, stale, tot) in summary.items():
        print(f"[degen-gate] {c:9s} {ok:5d} {al:8d} {bad:5d} "
              f"{stale:6d} {tot:6d}")
    if total_bad:
        print(f"[degen-gate] FAIL: {total_bad} undocumented failures")
        sys.exit(1)
    print("[degen-gate] all corpora green")


if __name__ == "__main__":
    main()
