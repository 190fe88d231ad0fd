#!/usr/bin/env python3
"""Round-over-round bench comparison that knows about broken artifacts.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold]

Accepts either artifact shape:
  - the full per-query map Bench writes to BENCH_LATEST.json, or
  - a driver BENCH_rNN.json wrapper ({"tail": ..., "parsed": ...}) —
    the per-query map is taken from "parsed" if present. (BENCH_r01-06
    wrappers all have parsed:null; historical per-query maps live in
    BENCH_LATEST.json at each round's end-of-round commit:
    `git show <commit>:BENCH_LATEST.json > /tmp/rN.json`.)

Prefer median-of-runs artifacts on BOTH sides (tools/bench_median.py —
round 13 onward BENCH_LATEST.json is the merged median of >= 3
close-window runs): single-run maps carry the machine's documented
±12% co-tenant band, which this compare cannot distinguish from a real
uniform regression.

Queries listed in BENCH_r05_BROKEN.json (fail-fast rows recorded during
the round-5 gate breakage) are excluded automatically whenever the OLD
side carries their fail-fast signature (most of them present at <0.1s)
— comparing against ~0.06s fail-fast times reports phantom regressions
(the round-6 ADVICE finding).
"""
import json
import os
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return (d["queries"], d.get("load_marker_sec"),
                d.get("load_marker_mem_sec"))
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return (d["parsed"]["queries"],
                d["parsed"].get("load_marker_sec"),
                d["parsed"].get("load_marker_mem_sec"))
    raise SystemExit(f"{path}: no per-query map found (driver wrappers "
                     "with parsed:null carry only a truncated stdout "
                     "tail; use the round commit's BENCH_LATEST.json)")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: python3 tools/bench_compare.py OLD.json NEW.json "
            "[threshold]\n\n" + __doc__.strip())
    old_path, new_path = sys.argv[1], sys.argv[2]
    try:
        threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    except ValueError:
        raise SystemExit(
            f"threshold must be a number, got {sys.argv[3]!r} — usage: "
            "python3 tools/bench_compare.py OLD.json NEW.json [threshold]")
    ((old, old_marker, old_mem),
     (new, new_marker, new_mem)) = load(old_path), load(new_path)
    # machine-load marker (VERDICT r13 #4): both artifacts record the
    # wall of the SAME fixed calibration job; if the two walls deviate
    # >25%, one side ran in a co-tenant-loaded window and the totals
    # compare measures the machine, not the code.
    if isinstance(old_marker, (int, float)) and \
            isinstance(new_marker, (int, float)) and min(
                old_marker, new_marker) > 0:
        drift = max(old_marker, new_marker) / min(old_marker, new_marker)
        note = (" *** LOAD-SKEWED WINDOW: treat per-query ratios as "
                "machine noise until rerun on comparable load ***"
                if drift > 1.25 else "")
        print(f"load marker {old_marker:.2f}s -> {new_marker:.2f}s "
              f"({drift:.2f}x drift){note}")
    elif old_marker is None or new_marker is None:
        print("[load marker absent on "
              + ("both sides" if old_marker is None and new_marker is None
                 else "the old side" if old_marker is None
                 else "the new side")
              + " — pre-r14 artifact; co-tenant load not self-identifying]")
    else:
        # both sides carry a marker but at least one is degenerate
        # (non-numeric or <= 0) — say so loudly instead of silently
        # skipping the drift line (ADVICE r14)
        print(f"[load marker DEGENERATE: old={old_marker!r} "
              f"new={new_marker!r} — cannot adjudicate window load; "
              "treat this compare as not-load-checked]")

    # second, memory-bandwidth-bound marker (round-15 finding: a
    # co-tenant regime can inflate every query while the CPU marker
    # stays calm). Optional — absent on pre-r15 artifacts.
    if isinstance(old_mem, (int, float)) and \
            isinstance(new_mem, (int, float)) and min(old_mem, new_mem) > 0:
        mdrift = max(old_mem, new_mem) / min(old_mem, new_mem)
        mnote = (" *** LOAD-SKEWED WINDOW (memory-bandwidth): treat "
                 "per-query ratios as machine noise until rerun on "
                 "comparable load ***" if mdrift > 1.25 else "")
        print(f"mem-bandwidth marker {old_mem:.2f}s -> {new_mem:.2f}s "
              f"({mdrift:.2f}x drift){mnote}")
    elif old_mem is None or new_mem is None:
        if old_mem is not None or new_mem is not None:
            print("[mem-bandwidth marker present on only one side — "
                  "pre-r15 artifact on the other; memory-bus co-tenancy "
                  "not cross-checkable]")
        # both None: pre-r15 on both sides — nothing to report
    else:
        # both sides carry a mem marker but at least one is degenerate
        # (non-numeric or <= 0) — mirror the CPU marker's explicit
        # DEGENERATE branch instead of misreporting "only one side"
        # (ADVICE r15)
        print(f"[mem-bandwidth marker DEGENERATE: old={old_mem!r} "
              f"new={new_mem!r} — cannot adjudicate memory-bus load; "
              "treat this compare as not-load-checked]")

    excluded = set()
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "BENCH_r05_BROKEN.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            broken = set(json.load(f)["broken_queries"])
        hits = [q for q in broken if q in old and old[q] < 0.1]
        if len(hits) >= 0.9 * len(broken):
            excluded = broken
            print(f"[excluding {len(excluded)} round-5 fail-fast queries "
                  f"per BENCH_r05_BROKEN.json — old side matches the "
                  f"fail-fast signature]")

    shared = sorted((set(old) & set(new)) - excluded)
    gone, added = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    regressions, wins = [], []
    for q in shared:
        o, n = old[q], new[q]
        if o <= 0:
            continue
        r = n / o
        if r >= threshold and n - o > 0.2:
            regressions.append((r, q, o, n))
        elif r <= 1 / threshold and o - n > 0.2:
            wins.append((r, q, o, n))

    tot_o = sum(old[q] for q in shared)
    tot_n = sum(new[q] for q in shared)
    print(f"shared={len(shared)} removed={len(gone)} added={len(added)}")
    print(f"shared-total {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)" if tot_o else "")
    for title, rows in (("REGRESSIONS", sorted(regressions, reverse=True)),
                        ("wins", sorted(wins))):
        if rows:
            print(f"-- {title} (>= {threshold}x and >0.2s abs) --")
            for r, q, o, n in rows:
                print(f"  {q:34s} {o:7.2f}s -> {n:7.2f}s  ({r:.2f}x)")
    if added:
        print("-- added --", ", ".join(added))
    if gone:
        print("-- removed --", ", ".join(gone))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
