#!/usr/bin/env python3
"""Records-consistency gate: a committed benchmark or correctness
artifact that records a failure must be NAMED in SURVEY.md with a
KNOWN_RED marker — a red record may exist (mid-investigation), but it
can never ship silently again (round 8 committed BENCH_SF100.json with
failed:[q53,q54,q58] while the survey text still described the
superseded zero-failure run).

Checks every BENCH_*.json / bench.json for non-empty "failed" and every
CORRECTNESS_*.json for any query whose rows/schema/hash matched false
(err == "no_oracle" rows-only entries are the documented exception).
Each offender must appear in SURVEY.md on a line containing
`KNOWN_RED` together with the artifact name, e.g.:

    KNOWN_RED: BENCH_SF100.json q53_pagerank — ENOSPC under bisection

Exit 0 = consistent; exit 1 = a red artifact is unacknowledged.
Run at end of round alongside the gates.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Driver-written per-round history (BENCH_r03.json, CORRECTNESS_r01.json
# ...) is an immutable record of how THAT round ended — early rounds
# legitimately contain failures that later rounds fixed. The consistency
# contract applies to the artifacts that describe the CURRENT tree: the
# per-scale gate records and the local bench record.
ROUND_HISTORY = re.compile(r"_r\d+\.json$")


def survey_acknowledges(survey: str, artifact: str, item: str) -> bool:
    for line in survey.splitlines():
        if "KNOWN_RED" in line and artifact in line and item in line:
            return True
    return False


def main() -> int:
    survey_path = os.path.join(ROOT, "SURVEY.md")
    survey = open(survey_path).read() if os.path.exists(survey_path) else ""
    problems = []

    # STREAMBENCH*.json joins the loop in r11: the streaming rates are
    # single-pass walls, so the calibration brackets (present since the
    # r11 records) are held to the same thresholds; the failed[]
    # check is vacuously green there (StreamBench has no failed field).
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_*.json"))
                       + glob.glob(os.path.join(ROOT, "bench.json"))
                       + glob.glob(os.path.join(ROOT, "STREAMBENCH*.json"))):
        name = os.path.basename(path)
        if ROUND_HISTORY.search(name):
            continue
        try:
            rec = json.load(open(path))
        except Exception as e:  # unparseable committed record is itself red
            problems.append(f"{name}: unparseable ({e})")
            continue
        # driver-side BENCH_r*.json wraps the record under "parsed"
        rec = rec.get("parsed", rec) if isinstance(rec, dict) else rec
        if not isinstance(rec, dict):
            continue
        for q in rec.get("failed") or []:
            if not survey_acknowledges(survey, name, q):
                problems.append(
                    f"{name}: failed query {q} not acknowledged "
                    f"(add 'KNOWN_RED: {name} {q} — <reason>' to SURVEY.md)")
        # LOAD-CONTAMINATION sentinel (round 9's committed bench was a
        # ~2.6x phantom regression from a stalling VM, shipped with
        # failed=[] so nothing flagged it). Bench records now carry a
        # fixed single-thread calibration loop bracketing the run; a
        # record whose calibration deviates >1.5x from the committed
        # machine reference was taken on a machine that was not itself,
        # and must either be re-taken quiet or KNOWN_RED-acknowledged.
        ref_path = os.path.join(ROOT, "tools", "calibration_ref.json")
        if os.path.exists(ref_path):
            ref_ms = json.load(open(ref_path)).get("calib_ms")
            # brackets are median-of-3 (tight 1.5x); the per-query worst
            # exists because the VM's stall windows DRIFT between runs
            # and can fall entirely between quiet brackets. Its 2.5x
            # threshold is CALIBRATED, not guessed: r10 measured the
            # noise floor of the per-query probe (min of 3 samples
            # spaced 250 ms, taken pre-boundary-GC) across three quiet
            # runs at 150-320 ms (1.1-2.4x) — JVM-internal micro-bursts
            # (concurrent-mark workers, cleaner IO), with hypervisor
            # steal ruled out (519 steal jiffies over the whole 10-min
            # run) — while the real stall the sentinel hunts measured
            # 1900 ms (14x) and spans minutes, inflating every probe in
            # its window far past any threshold in this range.
            # The per-query probes certify each query's TRAILING edge
            # (probe i runs after query i's reps), so with per-query
            # coverage the after-bracket is redundant — but NOT the
            # leading edge: see the checks note below. Known
            # limitation, by design of ANY probe scheme: a stall that
            # begins and ends entirely inside one very long single-rep
            # query's reps (sf100's 20-min q53) evades both probes and
            # brackets — the failed[] list and cross-record deltas
            # remain the backstop there.
            per_query = [v.get("calib_ms")
                         for v in (rec.get("queries") or {}).values()
                         if isinstance(v, dict)]
            has_pq = any(isinstance(c, (int, float)) and c > 0
                         for c in per_query)
            # LEADING-EDGE blind spot (ADVICE r10): the per-query probe
            # for query i runs AFTER its reps, so load present at run
            # start can inflate the warmup and the EARLIEST timed
            # windows yet drain before the first probe fires. Two
            # covers: calib_ms_start (post-warmup, pre-first-query —
            # benches emit it since r11) held to the tight bracket
            # threshold, and the before-bracket kept at a loosened 4x
            # even when per-query coverage exists (the JVM-start sample
            # legitimately reads somewhat high while a preceding
            # phase's load drains, but 818 ms-class contamination —
            # the r10 sf100 record's 6.1x — still trips it).
            checks = ([("calib_ms_before", 4.0), ("calib_ms_start", 1.5),
                       ("calib_ms_worst", 2.5)] if has_pq else
                      [("calib_ms_before", 1.5), ("calib_ms_start", 1.5),
                       ("calib_ms_after", 1.5), ("calib_ms_worst", 2.5)])
            for field, mult in checks:
                got = rec.get(field)
                if ref_ms and isinstance(got, (int, float)) and got > 0:
                    if got > mult * ref_ms and not survey_acknowledges(
                            survey, name, "load-contaminated"):
                        problems.append(
                            f"{name}: {field}={got:.0f}ms vs reference "
                            f"{ref_ms:.0f}ms (> {mult}x) — record taken on "
                            f"a loaded machine; re-take quiet or add "
                            f"'KNOWN_RED: {name} load-contaminated — "
                            f"<reason>' to SURVEY.md")
            # MERGED entries came from a SEPARATE targeted run whose
            # brackets ride in merged_entries — hold them to the same
            # thresholds, or a load-contaminated re-measure merges into
            # a record that still passes this gate (ADVICE r11). Same
            # per-query-coverage thresholds as above (targeted runs
            # carry per-query probes by construction).
            merged_checks = [("calib_ms_before", 4.0),
                             ("calib_ms_start", 1.5),
                             ("calib_ms_worst", 2.5)]
            for mq, ment in (rec.get("merged_entries") or {}).items():
                if not isinstance(ment, dict) or not ref_ms:
                    continue
                for field, mult in merged_checks:
                    got = ment.get(field)
                    if isinstance(got, (int, float)) and got > 0 \
                            and got > mult * ref_ms \
                            and not survey_acknowledges(
                                survey, name, "load-contaminated"):
                        problems.append(
                            f"{name}: merged entry {mq} {field}="
                            f"{got:.0f}ms vs reference {ref_ms:.0f}ms "
                            f"(> {mult}x) — targeted re-measure was "
                            f"load-contaminated; re-take quiet or add "
                            f"'KNOWN_RED: {name} load-contaminated — "
                            f"<reason>' to SURVEY.md")
            # the record-level worst must cover every per-query probe,
            # merged or native — a merge that skipped the recompute
            # would understate it (ADVICE r11)
            pq_worst = max((c for c in per_query
                            if isinstance(c, (int, float))), default=0)
            rec_worst = rec.get("calib_ms_worst")
            if isinstance(rec_worst, (int, float)) and pq_worst > 0 \
                    and rec_worst + 0.01 < pq_worst:
                problems.append(
                    f"{name}: calib_ms_worst={rec_worst:.0f}ms is below "
                    f"the per-query max {pq_worst:.0f}ms — stale after a "
                    f"merge; recompute (merge_bench_entries.py does this "
                    f"since r12)")

    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_*.json"))):
        name = os.path.basename(path)
        if ROUND_HISTORY.search(name):
            continue
        try:
            rec = json.load(open(path))
        except Exception as e:
            problems.append(f"{name}: unparseable ({e})")
            continue
        if not isinstance(rec, dict):
            continue
        for q, r in rec.items():
            if not isinstance(r, dict):
                continue
            err = r.get("err")
            if err in ("no_oracle", "skipped_at_scale"):
                continue  # documented rows-only / scale-skip entries
            red = (r.get("rows_match") is False
                   or r.get("schema_match") is False
                   or r.get("hash_match") is False
                   or (err is not None and err != ""))
            if red and not survey_acknowledges(survey, name, q):
                problems.append(
                    f"{name}: {q} red ({err or 'mismatch'}) not acknowledged "
                    f"(add 'KNOWN_RED: {name} {q} — <reason>' to SURVEY.md)")

    if problems:
        print("RECORDS INCONSISTENT:")
        for p in problems:
            print(" -", p)
        return 1
    print("records consistent: no unacknowledged red artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())
