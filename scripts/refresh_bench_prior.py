#!/usr/bin/env python3
"""Regenerate BENCH_PRIOR.tsv from the newest committed bench artifacts.

BENCH_PRIOR.tsv feeds graft.Bench's outlier self-defense: any row that
times >3x its prior-round figure — or, for a VOLATILE row (historical
hi >= 2x lo over the last two rounds), above its historical ceiling —
is automatically re-measured fresh (best-of-2) and reported under
"flagged_outliers". The spread columns exist because
x_dedup_minhash_fast oscillated 5.50 -> 2.48 -> 5.57 s across r14-r16
with untouched code, always under the one-sided 3x band, so the
defense never produced attribution evidence for it (r16 verdict
task 6).

The full per-query maps survive the driver's stdout truncation only in
the sf1 artifact (BENCH_r{N}_sf1.json carries the sf1 pass plus its
paired same-JVM sf0.1 slope pass), so those are the source of record:
the newest provides the prior, the newest TWO provide the [lo, hi]
spread.

Row format (tab-separated; 3-column legacy rows still parse in Bench):
    sf-name  query  latest-seconds  lo-seconds  hi-seconds

Usage: python3 scripts/refresh_bench_prior.py [BENCH_rNN_sf1.json]
       (default: highest-numbered BENCH_r*_sf1.json in the repo root;
        the spread always pulls in the next-newest artifact too)
"""
import glob
import json
import os
import re
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rnum(p):
    m = re.search(r"BENCH_r(\d+)_sf1", p)
    return int(m.group(1)) if m else -1


def load(path):
    d = json.load(open(path))
    if "queries" not in d:  # driver-wrapped artifact: payload under "parsed"
        d = d.get("parsed") or {}
    return d


cands = sorted(
    (c for c in glob.glob(os.path.join(root, "BENCH_r*_sf1.json")) if rnum(c) >= 0),
    key=rnum,
)
if len(sys.argv) > 1:
    src = sys.argv[1]
else:
    if not cands:
        sys.exit("no BENCH_r*_sf1.json found")
    src = cands[-1]

d = load(src)
if not d.get("queries"):
    sys.exit(f"{src} carries no per-query map")

# spread source: the artifact one round older than src (if any)
older = [c for c in cands if rnum(c) < rnum(src)]
prev = load(older[-1]) if older else {}

# the official driver artifacts (BENCH_r{N}.json, sf0.1) carry only the
# ~12-query stdout core, but that core is where the known oscillators
# live (x_dedup_minhash_fast swung 5.50 -> 2.48 -> 5.57 s across
# r14-r16 OFFICIAL runs while the paired-pass values sat near 2 s) —
# fold the newest two official sf0.1 core maps into the sf0.1 spread
# so context-dependent variance arms the volatile-row re-measure
def official_core():
    arts = sorted(
        (c for c in glob.glob(os.path.join(root, "BENCH_r*.json"))
         if re.fullmatch(r"BENCH_r\d+\.json", os.path.basename(c))),
        key=lambda p: int(re.search(r"BENCH_r(\d+)\.json", p).group(1)),
    )
    merged = {}
    for a in arts[-2:]:
        da = load(a)
        if not str(da.get("sf", "")).rstrip("/").endswith("sf0.1"):
            continue
        for q, s in da.get("queries", {}).items():
            if isinstance(s, (int, float)) and s >= 0:
                merged.setdefault(q, []).append(s)
    return merged


core01 = official_core()


# sf10 priors (r18 verdict task 1): the decade-up probe artifacts
# (BENCH_r{N}_sf10.json, primary pass = benchdata/sf10) carry full
# per-query maps too — two rounds of them arm the SAME flag-and-rerun
# machinery on the sf10 leg, so in-run JVM-state outliers there
# (x_dedup_substring_compact read 7.71 s vs 3.53 s isolated in r18)
# are auto-re-measured instead of needing hand-run isolated probes.
def sf10_artifacts():
    def r10(p):
        m = re.search(r"BENCH_r(\d+)_sf10", p)
        return int(m.group(1)) if m else -1
    arts = sorted(
        (c for c in glob.glob(os.path.join(root, "BENCH_r*_sf10.json")) if r10(c) >= 0),
        key=r10,
    )
    return [load(a) for a in arts[-2:]], [os.path.basename(a) for a in arts[-2:]]


sf10_loaded, sf10_names = sf10_artifacts()

rows = []
for sf, key in (("sf1", "queries"), ("sf0.1", "queries_sf2")):
    qs = d.get(key, {})
    ps = prev.get(key, {}) if prev else {}
    for q, s in sorted(qs.items()):
        if not (isinstance(s, (int, float)) and s >= 0):
            continue
        pv = ps.get(q)
        vals = [s] + ([pv] if isinstance(pv, (int, float)) and pv >= 0 else [])
        if sf == "sf0.1":
            vals += core01.get(q, [])
        if sf == "sf1":
            # the sf10 artifacts' paired same-JVM sf1 slope passes are
            # same-scale observations — fold them into the sf1 spread
            for a in sf10_loaded:
                v2 = a.get("queries_sf2", {}).get(q)
                if isinstance(v2, (int, float)) and v2 >= 0:
                    vals.append(v2)
        rows.append(f"{sf}\t{q}\t{s}\t{min(vals)}\t{max(vals)}")

if sf10_loaded:
    latest10 = sf10_loaded[-1].get("queries", {})
    older10 = sf10_loaded[0].get("queries", {}) if len(sf10_loaded) > 1 else {}
    for q, s in sorted(latest10.items()):
        if not (isinstance(s, (int, float)) and s >= 0):
            continue
        pv = older10.get(q)
        vals = [s] + ([pv] if isinstance(pv, (int, float)) and pv >= 0 else [])
        rows.append(f"sf10\t{q}\t{s}\t{min(vals)}\t{max(vals)}")

out = os.path.join(root, "BENCH_PRIOR.tsv")
src_names = os.path.basename(src) + (
    f" + {os.path.basename(older[-1])} (spread)" if older else ""
) + ("; official sf0.1 core folded into spread" if core01 else "") + (
    f"; sf10 rows from {' + '.join(sf10_names)}" if sf10_loaded else ""
)
hdr = (
    "# Prior-round per-query bench timings\n"
    "# (sf-name <TAB> query <TAB> latest-sec <TAB> lo-sec <TAB> hi-sec).\n"
    f"# Source: {src_names}; each source carries the sf1 pass plus its\n"
    "# paired same-JVM sf0.1 slope pass. Consumed by graft.Bench to\n"
    "# auto-rerun rows >3x their prior round, or volatile rows\n"
    "# (hi >= 2x lo) above their historical ceiling (flagged_outliers).\n"
    "# Refresh each round: scripts/refresh_bench_prior.py.\n"
)
with open(out, "w") as f:
    f.write(hdr + "\n".join(rows) + "\n")
print(f"wrote {len(rows)} rows from {src_names} -> {out}")
