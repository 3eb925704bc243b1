#!/usr/bin/env python3
"""Gate-provenance check: every committed scale-gate artifact should
certify the tree it sits in. Rounds 10 and 11 both ended with "re-X at
HEAD" quietly meaning "at HEAD minus the commits that came after" —
a src/main commit landing after the newest gate artifact makes the
gate's "at HEAD" claim silently false (VERDICT r11 What's-wrong #3 /
next-round item 5).

For each gate artifact, compare the commit that last touched it with
the commits that touched src/main afterwards. A gate older than the
newest src/main change must either be re-run, or the gap must be
ACKNOWLEDGED in SURVEY.md on a line containing `GATE_PROVENANCE`
together with the artifact name, why the stale gap is result-neutral,
and — since r13 (ADVICE r12: an un-pinned ack never expires, silencing
staleness for every later round) — the NEWEST src/main commit the
argument actually considered, as `covers <hash>` within the ack's
first four lines. src/main commits landing AFTER the covered commit
re-flag the gate: each new round must re-make (or re-date) the
argument, not inherit it. E.g.:

    GATE_PROVENANCE: CORRECTNESS_SF100.json (covers 3e2b754) — r13
    touched only q53's pair derivation, proven multiset-identical by
    spec and re-gated at sf1+sf10 at HEAD.

Exit 0 = every gate certifies HEAD or its gap is acknowledged;
exit 1 otherwise. Run at round close BEFORE the leak stamp, so the
stamp is genuinely the last commit.
"""
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = [
    "CORRECTNESS_SF1.json", "CORRECTNESS_SF10.json",
    "CORRECTNESS_SF100.json", "BENCH_SF1.json", "BENCH_SF10.json",
    "BENCH_SF100.json", "STREAMBENCH.json", "STREAMBENCH_SF10.json",
    "OVERRIDE_EQUIV.txt", "PLANS_SF01.md", "PLANS_SF10.md",
]


def git(*args: str) -> str:
    return subprocess.run(["git", "-C", ROOT, *args], check=True,
                          capture_output=True, text=True).stdout.strip()


def main() -> int:
    survey_path = os.path.join(ROOT, "SURVEY.md")
    survey = open(survey_path).read() if os.path.exists(survey_path) else ""
    problems = []
    for gate in GATES:
        if not os.path.exists(os.path.join(ROOT, gate)):
            continue
        gate_commit = git("log", "-1", "--format=%H", "--", gate)
        if not gate_commit:
            problems.append(f"{gate}: not committed")
            continue
        # src/main commits the gate does not cover
        later = git("log", "--format=%h %s", f"{gate_commit}..HEAD",
                    "--", "src/main")
        if not later:
            continue
        lines = later.splitlines()
        # the ack must PIN the newest src/main commit it considered
        # ("covers <hash>" within 4 lines of the GATE_PROVENANCE line —
        # SURVEY wraps prose); commits past the pin re-flag the gate
        ack_commit = None
        survey_lines = survey.splitlines()
        for i, line in enumerate(survey_lines):
            if "GATE_PROVENANCE" in line and gate in line:
                window = " ".join(survey_lines[i:i + 4])
                m = re.search(r"covers\s+([0-9a-f]{7,40})\b", window)
                if m:
                    ack_commit = m.group(1)
                else:
                    problems.append(
                        f"{gate}: GATE_PROVENANCE ack carries no "
                        f"'covers <commit>' pin (ADVICE r12: un-pinned "
                        f"acks never expire) — name the newest src/main "
                        f"commit the argument considered")
                break
        if ack_commit:
            try:
                uncovered = git("log", "--format=%h %s",
                                f"{ack_commit}..HEAD", "--", "src/main")
            except subprocess.CalledProcessError:
                problems.append(
                    f"{gate}: GATE_PROVENANCE pin '{ack_commit}' is not "
                    f"a commit in this repo")
                continue
            if not uncovered:
                continue
            ulines = uncovered.splitlines()
            problems.append(
                f"{gate}: {len(ulines)} src/main commit(s) postdate the "
                f"acknowledged pin {ack_commit} (newest: {ulines[0]}) — "
                f"re-run the gate or re-make the GATE_PROVENANCE "
                f"argument for the new commits")
        else:
            problems.append(
                f"{gate}: {len(lines)} src/main commit(s) postdate it "
                f"(newest: {lines[0]}) — re-run the gate or add "
                f"'GATE_PROVENANCE: {gate} (covers <commit>) — <why "
                f"result-neutral>' to SURVEY.md")
    if problems:
        print("GATE PROVENANCE STALE:")
        for p in problems:
            print(" -", p)
        return 1
    print("gate provenance clean: every gate certifies HEAD "
          "(or its gap is acknowledged)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
