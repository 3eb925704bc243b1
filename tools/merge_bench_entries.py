#!/usr/bin/env python3
"""Merge per-query entries from a targeted re-measure run into a
committed bench record — the r10 sf100 precedent (q22/q90 were
re-measured after their fixes and merged), made repeatable.

Usage: merge_bench_entries.py <committed.json> <targeted.json> <q1,q2,...>

Each named query's entry in the committed record is REPLACED by (or, if
absent, ADDED from) the targeted record's entry, the summary totals
(value, full_total, n_queries) are recomputed from the merged query
map, and a `merged_entries` field records which entries came from a
separate run (with the targeted run's calibration brackets), so the
record's provenance is machine-readable instead of folklore.
"""
import json
import sys


def main():
    committed_path, targeted_path, names = sys.argv[1], sys.argv[2], \
        sys.argv[3].split(",")
    rec = json.load(open(committed_path))
    tgt = json.load(open(targeted_path))
    merged = rec.get("merged_entries", {})
    for name in names:
        if name not in tgt["queries"]:
            sys.exit(f"{name} not in targeted record")
        # a query the targeted run FAILED has a wall that measures the
        # failure path, not the operator — merging it would launder a
        # red reading into a committed record that still passes
        # check_records.py (ADVICE r11)
        if name in (tgt.get("failed") or []):
            sys.exit(f"{name} is in the targeted record's failed[] — "
                     f"fix and re-measure before merging")
        rec["queries"][name] = tgt["queries"][name]
        merged[name] = {
            "source_sf": tgt["sf"],
            "probe_cap": tgt.get("probe_cap"),
            "warm_pass": tgt.get("warm_pass"),
            "calib_ms_before": tgt.get("calib_ms_before"),
            "calib_ms_start": tgt.get("calib_ms_start"),
            "calib_ms_after": tgt.get("calib_ms_after"),
            "calib_ms_worst": tgt.get("calib_ms_worst"),
        }
    rec["merged_entries"] = merged
    # q88's one-off build is re-measured by the targeted run when present
    if tgt.get("build_sec", 0) > 0:
        rec["build_sec"] = tgt["build_sec"]
    rec["value"] = round(sum(q["median"] for q in rec["queries"].values()), 3)
    rec["full_total"] = round(
        sum(q["full_median"] for q in rec["queries"].values()), 3)
    rec["n_queries"] = len(rec["queries"])
    # the record-level worst must cover the merged entries' own probes,
    # or a load-contaminated targeted re-measure slips under the
    # committed record's calib_ms_worst gate (ADVICE r11)
    per_query_worst = max(
        (q.get("calib_ms", 0) for q in rec["queries"].values()
         if isinstance(q.get("calib_ms"), (int, float))), default=0)
    rec["calib_ms_worst"] = round(
        max(rec.get("calib_ms_worst", 0), per_query_worst), 3)
    with open(committed_path, "w") as f:
        # compact separators: match Bench's hand-built JSON so merged
        # records diff cleanly against fresh ones (ADVICE r11)
        json.dump(rec, f, separators=(",", ":"))
        f.write("\n")
    print(f"merged {names} into {committed_path}: value={rec['value']} "
          f"full_total={rec['full_total']} n={rec['n_queries']}")


if __name__ == "__main__":
    main()
