#!/usr/bin/env python3
"""Merge N close-window Bench runs into one median-per-query artifact.

Usage: python3 tools/bench_median.py OUT.json RUN1.json RUN2.json [...]

Why (VERDICT r12 #6): one Bench run already reports the median of its
in-process warm passes, but co-tenant load bursts on this machine span
whole runs — the r12 compare showed a uniform +5% drift across
UNTOUCHED queries in one run and 0.97x in another the same day. A
per-query median across >= 3 separate close-window runs suppresses
exactly that, so the committed BENCH_LATEST.json carries numbers a
round-over-round compare can gate on without a "calm machine"
footnote. tools/bench_compare.py consumes the merged artifact
unchanged (it has the same {"queries": ...} shape, plus provenance).

Recipe (round close):
  for i in 1 2 3; do
    SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.Bench"
    cp BENCH_LATEST.json /tmp/bench_run$i.json
  done
  python3 tools/bench_median.py BENCH_LATEST.json /tmp/bench_run*.json
"""
import json
import statistics
import sys


def main():
    if len(sys.argv) < 4:
        raise SystemExit("need OUT.json and >= 2 run files\n\n"
                         + __doc__.strip())
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            runs.append(json.load(f))
    names = sorted({q for r in runs for q in r["queries"]})
    merged, coverage = {}, {}
    for q in names:
        vals = [r["queries"][q] for r in runs
                if q in r["queries"] and r["queries"][q] >= 0]
        if not vals:
            continue
        merged[q] = round(statistics.median(vals), 3)
        coverage[q] = len(vals)
    partial = {q: c for q, c in coverage.items() if c < len(runs)}
    if partial:
        print(f"[warn] {len(partial)} queries missing from some runs: "
              + ", ".join(sorted(partial)[:10]))
    total = round(sum(merged.values()), 3)
    out = {
        "queries": merged,
        "n_queries": len(merged),
        "median_of_runs": len(runs),
        "run_totals_sec": [round(sum(v for v in r["queries"].values()
                                     if v >= 0), 3) for r in runs],
        # cold pass attribution from the FIRST run (later runs ride the
        # cross-session artifacts the first one built)
        "cold_queries": runs[0].get("cold_queries", {}),
        "cold_total_sec": runs[0].get("cold_total_sec"),
        "warm_passes_per_run": runs[0].get("warm_passes"),
        "sf": runs[0].get("sf"),
        # machine-load marker (VERDICT r13 #4): median of the per-run
        # calibration-job walls, so the merged artifact stays
        # self-identifying; bench_compare annotates on >25% deviation
        "load_marker_sec": (round(statistics.median(ms), 3) if (ms := [
            r["load_marker_sec"] for r in runs
            if isinstance(r.get("load_marker_sec"), (int, float))])
            else None),
        "load_marker_runs": [r.get("load_marker_sec") for r in runs],
        # second, memory-bandwidth marker (round 15) — same treatment
        "load_marker_mem_sec": (round(statistics.median(mm), 3)
            if (mm := [r["load_marker_mem_sec"] for r in runs
                       if isinstance(r.get("load_marker_mem_sec"),
                                     (int, float))])
            else None),
        "load_marker_mem_runs": [
            r.get("load_marker_mem_sec") for r in runs],
        "metric": "total", "unit": "sec", "value": total,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(f"{out_path}: {len(merged)} queries, median-of-{len(runs)} "
          f"total {total:.1f}s (run totals: "
          + ", ".join(f"{t:.1f}s" for t in out["run_totals_sec"]) + ")")


if __name__ == "__main__":
    main()
