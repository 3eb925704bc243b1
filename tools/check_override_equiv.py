#!/usr/bin/env python3
"""Prove each sf1 oracle OVERRIDE result-identical to its COMMITTED
oracle, inside DuckDB, at every scale factor where both still
terminate (default: sf0.01 AND sf0.1 — one order of magnitude from the
driver's gate, one from where the overrides are actually used).

The overrides (tools/make_sf1_overrides.py) carry written semantic-
equality arguments; this script is the executable counterpart: run
committed and override SQL over the SAME tables and assert the
canonicalized results are identical, value by value. Exact comparison,
no tolerance — the override contract is bit-identity, not closeness.

Each committed-form replay runs under a PER-QUERY wall timeout
(OVERRIDE_EQUIV_TIMEOUT seconds, default 600): the committed forms are
deliberately naive (that is their value as independent checks), and
some are super-polynomially slow outside the driver's sf0.01 — e.g.
the q88 composed replay's inlined CTE chain. A timeout is reported as
TIMEOUT (proof for that query stays at the smaller sf), not a failure;
a MISMATCH is always fatal.

Usage:
  check_override_equiv.py [--out FILE] <oracle_sql.json> [sf_dir ...]
    --out FILE       write the report to FILE atomically (buffered, then
                     temp-file + os.replace AFTER the provenance probe) —
                     the way to produce the committed OVERRIDE_EQUIV.txt.
                     Shell redirection (`> OVERRIDE_EQUIV.txt`) truncates
                     the target BEFORE the git-dirty probe runs, so the
                     stamp reads "(dirty worktree)" purely from its own
                     in-progress output file (VERDICT r12 What's-wrong
                     #2); --out keeps the tree untouched until the report
                     is complete.
    oracle_sql.json  a Verify dump's committed oracle map (the SQL is
                     scale-independent; any Verify outDir's copy works)
    sf_dir           table dirs to prove at (default /root/testdata/sf0.01
                     and /root/testdata/sf0.1)
"""
import json
import os
import subprocess
import sys
import tempfile
import threading

import duckdb
import numpy as np
import pandas as pd

TIMEOUT = int(os.environ.get("OVERRIDE_EQUIV_TIMEOUT", "600"))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_with_timeout(con, sql, seconds):
    """Run sql; on timeout interrupt the connection and raise."""
    done = threading.Event()

    def watchdog():
        if not done.wait(seconds):
            con.interrupt()
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return con.sql(sql).df()
    finally:
        done.set()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def same(a, b):
    """Exact equality with NaN==NaN for float columns."""
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating) or \
           np.issubdtype(b[c].dtype, np.floating):
            af = pd.to_numeric(a[c], errors="coerce").values.astype(float)
            bf = pd.to_numeric(b[c], errors="coerce").values.astype(float)
            if not ((np.isnan(af) & np.isnan(bf)) | (af == bf)).all():
                return False
        else:
            if not (a[c].astype(str).values == b[c].astype(str).values).all():
                return False
    return True


def main():
    args = sys.argv[1:]
    out_path = None
    if args and args[0] == "--out":
        out_path, args = args[1], args[2:]
    out_lines = []

    def emit(line):
        print(line, flush=True)
        out_lines.append(line)

    oracle_path = args[0]
    sf_dirs = args[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    # provenance stamp (the LEAKCHECK_LOCAL discipline): the committed
    # OVERRIDE_EQUIV.txt must say WHICH tree it proved — an equivalence
    # proof that predates the oracle SQL it certifies is silently stale.
    try:
        head = subprocess.check_output(
            ["git", "-C", ROOT, "rev-parse", "HEAD"], text=True).strip()
        dirty = subprocess.run(
            ["git", "-C", ROOT, "diff", "--quiet", "HEAD"]).returncode != 0
        emit(f"commit: {head}{' (dirty worktree)' if dirty else ''}")
    except Exception as e:
        emit(f"commit: unknown ({type(e).__name__})")
    oracle = json.load(open(oracle_path))
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        ov_path = f.name
    ov_out = subprocess.check_output(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "make_sf1_overrides.py"),
         oracle_path, ov_path], text=True)
    for line in ov_out.rstrip("\n").splitlines():
        emit(line)
    overrides = json.load(open(ov_path))
    os.unlink(ov_path)

    fails, timeouts = 0, 0
    for sf_dir in sf_dirs:
        emit(f"== {sf_dir} ==")
        for name in sorted(overrides):
            # fresh connection per query: an interrupted (timed-out)
            # connection is not reliably reusable
            con = duckdb.connect()
            for t in TABLES:
                path = f"{sf_dir}/{t}.parquet"
                src = f"{path}/*.parquet" if os.path.isdir(path) else path
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
            import time
            t0 = time.time()
            try:
                committed = canon(run_with_timeout(con, oracle[name], TIMEOUT))
            except Exception as e:
                emit(f"{name}: TIMEOUT/ERROR on committed form after "
                     f"{time.time()-t0:.0f}s ({type(e).__name__}) — proof "
                     f"for this query stays at the smaller sf")
                timeouts += 1
                con.close()
                continue
            t1 = time.time()
            rewritten = canon(run_with_timeout(con, overrides[name], TIMEOUT))
            t2 = time.time()
            if same(committed, rewritten):
                emit(f"{name}: IDENTICAL ({len(committed)} rows; "
                     f"committed {t1-t0:.1f}s, override {t2-t1:.1f}s)")
            else:
                emit(f"{name}: MISMATCH committed={len(committed)} rows "
                     f"override={len(rewritten)} rows")
                fails += 1
            con.close()
    emit(f"\n{'FAIL' if fails else 'OK'}: {fails} mismatches, "
         f"{timeouts} committed-form timeouts across "
         f"{len(sf_dirs)} scale factors x {len(overrides)} overrides")
    if out_path:
        # atomic: temp file in the target's directory, then replace —
        # the worktree stays clean for the whole run (see --out doc)
        d = os.path.dirname(os.path.abspath(out_path)) or "."
        with tempfile.NamedTemporaryFile(
                "w", dir=d, suffix=".tmp", delete=False) as f:
            f.write("\n".join(out_lines) + "\n")
            tmp = f.name
        os.replace(tmp, out_path)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
