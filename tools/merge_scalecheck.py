#!/usr/bin/env python3
"""Merge extra per-query scale points (from filtered Bench runs at
synthesized SFs) into SCALECHECK.json.

scalecheck.py rebuilds the ledger whole-sale from full Bench runs at
the standard SFs; the heavy-tail audit adds points at synthesized SFs
(/tmp/sf0.3, /tmp/sf0.6 via make_scale_dir.py) for a HAND-PICKED set
of expensive queries — running the full 229-query suite at sf0.6 would
spend an hour pricing queries whose 3-point fits are already flat.
This tool appends those points to the existing entries (or creates
entries for queries newer than the last full run), re-derives the
exponent chain, and re-applies the same flag rule scalecheck.py uses.

Usage:
  python3 tools/merge_scalecheck.py <bench.json> [<bench.json> ...]

Each bench.json is a graft.Bench output line (the tool reads the
"queries" map and the sf dir). Points are upserted by (query, sf):
an existing measurement at the same sf is replaced, never duplicated.
"""
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sf_of(bench: dict) -> float:
    tail = str(bench.get("sf", "")).rstrip("/").split("sf")[-1]
    return float(tail)


def main() -> int:
    path = os.path.join(REPO, "SCALECHECK.json")
    with open(path) as f:
        ledger = json.load(f)
    threshold = ledger.get("threshold", 1.30)
    floor = ledger.get("floor_sec", 0.75)
    queries = ledger["queries"]

    for bpath in sys.argv[1:]:
        with open(bpath) as f:
            bench = json.load(f)
        sf = sf_of(bench)
        for q, t in bench["queries"].items():
            entry = queries.setdefault(q, {"sf": [], "sec": []})
            pts = {s: x for s, x in zip(entry["sf"], entry["sec"])}
            pts[sf] = t
            sfs = sorted(pts)
            entry["sf"] = sfs
            entry["sec"] = [pts[s] for s in sfs]

    for q, entry in queries.items():
        sfs, secs = entry["sf"], entry["sec"]
        if any(t is None or t < 0 for t in secs):
            entry["flag"] = "FAILED"
            # a stale exponent chain from a prior fit would read as a
            # real measurement beside the FAILED flag
            entry.pop("exponents", None)
            continue
        exps = []
        for i in range(1, len(secs)):
            lo, hi = max(secs[i - 1], 1e-3), max(secs[i], 1e-3)
            exps.append(round(math.log(hi / lo) /
                              math.log(sfs[i] / sfs[i - 1]), 3))
        entry["exponents"] = exps
        # a single-point entry (a query newer than the last full run)
        # must not read as measured-linear "ok" — scalecheck.py itself
        # refuses to fit fewer than two points
        entry["flag"] = ("UNMEASURED" if not exps
                         else "SUPER-LINEAR"
                         if exps[-1] > threshold and secs[-1] >= floor
                         else "ok")

    # the top-level "sf" header (written by scalecheck.py for its full
    # runs) must describe the sfs actually present after the merge —
    # the union over entries, not the last full run's list
    ledger["sf"] = sorted({s for e in queries.values() for s in e["sf"]})

    with open(path, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
    flagged = [q for q, e in queries.items() if e["flag"] == "SUPER-LINEAR"]
    failed = [q for q, e in queries.items() if e["flag"] == "FAILED"]
    print(f"[merge_scalecheck] {len(queries)} entries, "
          f"{len(flagged)} super-linear {flagged}, {len(failed)} failed {failed}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
