#!/usr/bin/env python3
"""Per-query scaling-ratio audit: estimate each query's empirical
scaling exponent from Bench runs at two (or more) scale factors and
flag super-linear queries automatically.

With testdata at sf0.001 / sf0.01 / sf0.1 (10x data per step), a query
whose cost is t ~ data^e shows t_big / t_small ~ 10^e between adjacent
SFs. The audit fits e = log10(t_big / t_small) per adjacent pair and
flags:

  SUPER-LINEAR  e > threshold (default 1.30) at the largest pair and
                t_big above the noise floor -- a d04-family stage-count
                floor inflates SMALL-sf times, which pushes e DOWN, so
                a high e at the top pair is a real danger signal.
  FAILED        -1 timings (query failed a bench pass).

Fixed per-query overhead (JVM, planning, stage scheduling ~ hundreds of
ms) dominates small-sf runs, so sub-linear exponents are expected and
fine; the tool exists to catch the opposite tail, the silent quadratic.

Usage:
  python3 tools/scalecheck.py                      # run Bench at sf0.01+sf0.1
  python3 tools/scalecheck.py --sf 0.001 0.01 0.1  # three-point audit
  python3 tools/scalecheck.py --from a.json b.json # reuse bench_out.json files
  python3 tools/scalecheck.py --threshold 1.5 --floor 1.0

Writes SCALECHECK.json ({query: {times, exponents, flag}}) and prints a
ranked table.
"""
import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf: str, passes: str = "2") -> dict:
    """Run graft.Bench at one SF, return its parsed JSON line."""
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}",
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_PASSES=passes)
    print(f"[scalecheck] benching sf{sf} ...", file=sys.stderr)
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    # Bench also persists bench_out.json; fall back to it
    path = os.path.join(REPO, "bench_out.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    raise SystemExit(f"[scalecheck] no bench output for sf{sf}; "
                     f"stderr tail: {proc.stderr[-2000:]}")


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def sf_of(bench: dict) -> float:
    """Numeric scale factor parsed from the bench line's sf dir."""
    tail = str(bench.get("sf", "")).rstrip("/").split("sf")[-1]
    try:
        return float(tail)
    except ValueError:
        raise SystemExit(f"[scalecheck] cannot parse sf from {bench.get('sf')}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", nargs="+", default=["0.01", "0.1"],
                    help="scale factors to bench (ascending)")
    ap.add_argument("--from", dest="files", nargs="+",
                    help="reuse existing bench JSON files instead of running")
    ap.add_argument("--threshold", type=float, default=1.30,
                    help="flag exponent above this at the largest SF pair")
    ap.add_argument("--floor", type=float, default=0.75,
                    help="ignore queries faster than this (sec) at the top SF")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALECHECK.json"))
    args = ap.parse_args()

    benches = ([load(p) for p in args.files] if args.files
               else [run_bench(sf) for sf in args.sf])
    benches.sort(key=sf_of)
    if len(benches) < 2:
        raise SystemExit("[scalecheck] need at least two scale factors")
    sfs = [sf_of(b) for b in benches]
    if len(set(sfs)) != len(sfs):
        raise SystemExit(f"[scalecheck] duplicate scale factors: {sfs}")

    queries = sorted(set().union(*[b["queries"].keys() for b in benches]))
    report, flagged, failed = {}, [], []
    for q in queries:
        times = [b["queries"].get(q) for b in benches]
        entry = {"sf": sfs, "sec": times}
        if any(t is None or t < 0 for t in times):
            entry["flag"] = "FAILED"
            failed.append(q)
        else:
            exps = []
            for i in range(1, len(times)):
                ratio_d = sfs[i] / sfs[i - 1]
                # guard degenerate sub-ms times
                lo, hi = max(times[i - 1], 1e-3), max(times[i], 1e-3)
                exps.append(round(math.log(hi / lo) / math.log(ratio_d), 3))
            entry["exponents"] = exps
            top = exps[-1]
            if top > args.threshold and times[-1] >= args.floor:
                entry["flag"] = "SUPER-LINEAR"
                flagged.append((q, top, times))
            else:
                entry["flag"] = "ok"
        report[q] = entry

    with open(args.out, "w") as f:
        json.dump({"threshold": args.threshold, "floor_sec": args.floor,
                   "sf": sfs, "queries": report}, f, indent=1, sort_keys=True)

    width = max(len(q) for q in queries)
    hdr_sfs = " ".join(f"sf{s:g}".rjust(9) for s in sfs)
    print(f"{'query'.ljust(width)} {hdr_sfs} {'exponents'.rjust(14)}  flag")
    for q in queries:
        e = report[q]
        secs = " ".join(("   FAILED" if t is None or t < 0 else f"{t:9.2f}")
                        for t in e["sec"])
        exps = ",".join(str(x) for x in e.get("exponents", [])) or "-"
        mark = e["flag"] if e["flag"] != "ok" else ""
        print(f"{q.ljust(width)} {secs} {exps.rjust(14)}  {mark}")
    print(f"\n[scalecheck] {len(queries)} queries, "
          f"{len(flagged)} super-linear (e > {args.threshold}, "
          f"t >= {args.floor}s at sf{sfs[-1]:g}), {len(failed)} failed "
          f"-> {os.path.relpath(args.out, REPO)}")
    for q, e, times in sorted(flagged, key=lambda x: -x[1]):
        print(f"  SUPER-LINEAR {q}: e={e} times={times}")
    return 1 if (flagged or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
