#!/usr/bin/env python3
"""Scale-step ratio table: given two Bench outputs (e.g. bench.json at
sf0.1 and BENCH_SF1.json at 10x the data), print a markdown table of
per-query medians and the sf1/sf0.1 ratio, worst first. A ratio near 1
is sublinear in data size; near 10 is linear; the near-linear criterion
for the 10x step is <= ~12x.

Usage: bench_ratio.py <base_bench.json> <scaled_bench.json> [top_n=15]
"""
import json
import sys


def main():
    base = json.load(open(sys.argv[1]))
    scaled = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    bq = {k: v["median"] for k, v in base["queries"].items()}
    sq = {k: v["median"] for k, v in scaled["queries"].items()}
    shared = sorted(set(bq) & set(sq))
    rows = []
    for k in shared:
        ratio = sq[k] / bq[k] if bq[k] > 0 else float("inf")
        rows.append((k, bq[k], sq[k], ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {base['sf'].split('/')[-1]} s | "
          f"{scaled['sf'].split('/')[-1]} s | ratio |")
    print("|---|---|---|---|")
    for k, b, s, r in rows[:top_n]:
        print(f"| {k} | {b:.2f} | {s:.2f} | {r:.1f}x |")
    tb, ts = sum(bq[k] for k in shared), sum(sq[k] for k in shared)
    print(f"| **total ({len(shared)} shared)** | **{tb:.1f}** "
          f"| **{ts:.1f}** | **{ts / tb:.1f}x** |")


if __name__ == "__main__":
    main()
