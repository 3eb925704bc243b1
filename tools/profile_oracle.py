#!/usr/bin/env python3
"""Per-query DuckDB oracle profiler: times each oracle SQL against the
given sf tables IN A SUBPROCESS with a hard timeout, so one pathological
replay (e.g. an exponentially-inlined CTE chain) can't stall the whole
gate run. Prints one line per query (seconds or TIMEOUT) plus a sorted
summary — the tool that decides which sf1 replays need overrides.

Usage: profile_oracle.py <sf_dir> <oracle_sql.json> [timeout_sec=120]
         [overrides.json]
"""
import json
import multiprocessing as mp
import os
import sys
import time


def run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    t0 = time.time()
    n = len(con.sql(sql).fetchall())
    q.put((time.time() - t0, n))


def main():
    sf_dir = sys.argv[1]
    oracle = json.load(open(sys.argv[2]))
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    if len(sys.argv) > 4:
        ov = json.load(open(sys.argv[4]))
        oracle.update(ov)
        print(f"[overrides] {sorted(ov)}")
    results = []
    for name in sorted(oracle):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, oracle[name], q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            results.append((name, None, None))
            print(f"{name}: TIMEOUT >{timeout:.0f}s", flush=True)
        elif p.exitcode != 0:
            results.append((name, -1.0, None))
            print(f"{name}: CRASHED exit={p.exitcode}", flush=True)
        else:
            sec, rows = q.get()
            results.append((name, sec, rows))
            print(f"{name}: {sec:.2f}s ({rows} rows)", flush=True)
    print("\n=== slowest ===")
    for name, sec, rows in sorted(results,
                                  key=lambda r: -(r[1] if r[1] else 1e9)):
        label = "TIMEOUT" if sec is None else f"{sec:.2f}s"
        print(f"  {name}: {label}")
    done = [s for _, s, _ in results if s and s > 0]
    print(f"total measured: {sum(done):.1f}s over {len(done)} queries; "
          f"{sum(1 for _, s, _ in results if s is None)} timeouts")


if __name__ == "__main__":
    main()
