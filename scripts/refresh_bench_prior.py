#!/usr/bin/env python3
"""Regenerate BENCH_PRIOR.tsv from the newest committed bench artifact.

BENCH_PRIOR.tsv feeds graft.Bench's outlier self-defense: any row that
times >3x its prior-round figure is automatically re-measured fresh
(best-of-2) and reported under "flagged_outliers" — the in-run
JVM-state victims that needed hand-probes in r13-r15.

The full per-query maps survive the driver's stdout truncation only in
the sf1 artifact (BENCH_r{N}_sf1.json carries the sf1 pass plus its
paired same-JVM sf0.1 slope pass), so that is the source of record.

Usage: python3 scripts/refresh_bench_prior.py [BENCH_rNN_sf1.json]
       (default: highest-numbered BENCH_r*_sf1.json in the repo root)
"""
import glob
import json
import os
import re
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if len(sys.argv) > 1:
    src = sys.argv[1]
else:
    cands = glob.glob(os.path.join(root, "BENCH_r*_sf1.json"))
    def rnum(p):
        m = re.search(r"BENCH_r(\d+)_sf1", p)
        return int(m.group(1)) if m else -1
    cands = [c for c in cands if rnum(c) >= 0]
    if not cands:
        sys.exit("no BENCH_r*_sf1.json found")
    src = max(cands, key=rnum)

d = json.load(open(src))
if "queries" not in d:  # driver-wrapped artifact: payload under "parsed"
    d = d.get("parsed") or {}
if not d.get("queries"):
    sys.exit(f"{src} carries no per-query map")

rows = []
for sf, qs in (("sf1", d.get("queries", {})), ("sf0.1", d.get("queries_sf2", {}))):
    for q, s in sorted(qs.items()):
        if isinstance(s, (int, float)) and s >= 0:
            rows.append(f"{sf}\t{q}\t{s}")

out = os.path.join(root, "BENCH_PRIOR.tsv")
hdr = (
    "# Prior-round per-query bench timings (sf-name <TAB> query <TAB> seconds).\n"
    f"# Source: {os.path.basename(src)} (sf1 pass + its paired same-JVM sf0.1 slope pass).\n"
    "# Consumed by graft.Bench to auto-rerun rows >3x their prior round\n"
    "# (flagged_outliers). Refresh each round: scripts/refresh_bench_prior.py.\n"
)
with open(out, "w") as f:
    f.write(hdr + "\n".join(rows) + "\n")
print(f"wrote {len(rows)} rows from {os.path.basename(src)} -> {out}")
