#!/usr/bin/env python3
"""Build sf1 oracle overrides: semantically-equal rewrites of the four
oracle SQLs that are quadratic IN DUCKDB at sf1. The engine-side Spark
queries are banded/bucketed (subquadratic, plan-guarded) — but their
committed DuckDB replays use literal all-pairs joins, which is the
POINT at the driver's sf0.01 (the oracle must be structurally simpler
than the engine) and prohibitive at sf1's 1.25e9 doc pairs.

Exactness arguments (no approximation is introduced):
- q21 / q79 / q73's near-dup screen: gen_sf1.py suffixes EVERY
  whitespace token of copies r > 0 with '~r', so a cross-copy doc pair
  shares zero tokens, hence zero trigrams/shingles, hence
  Jaccard = containment = 0 — strictly below every threshold these
  queries apply. Restricting the pair join to equal copy blocks
  (doc_id // stride) removes only provably-excluded pairs.
- q22: pigeonhole — hamming(a,b) <= 3 over a 64-bit signature implies
  the pair agrees exactly on at least one of four 16-bit bands, so a
  UNION of four band equi-joins generates a candidate superset; the
  unchanged exact hamming filter then reproduces the original
  semantics with NO generator assumption at all (cross-copy simhash
  collisions, were any to exist, are still found).

Usage: make_sf1_overrides.py <oracle_sql.json> <out.json> [stride=5000]
"""
import json
import sys

src, out = sys.argv[1], sys.argv[2]
stride = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
d = json.load(open(src))
ov = {}


def patched(name, old, new):
    sql = d[name]
    assert old in sql, f"{name}: expected predicate not found"
    ov[name] = sql.replace(old, new)


block = f"a.doc_id // {stride} = b.doc_id // {stride}"
patched("q21_dedup_minhash", "ON a.doc_id < b.doc_id",
        f"ON a.doc_id < b.doc_id AND {block}")
patched("q79_containment", "ON a.doc_id < b.doc_id",
        f"ON a.doc_id < b.doc_id AND {block}")
patched("q73_incremental_dedup", "ON len(b.tri) > 0 AND len(ix.tri) > 0",
        "ON len(b.tri) > 0 AND len(ix.tri) > 0 "
        f"AND b.doc_id // {stride} = ix.doc_id // {stride}")

tail = """SELECT doc_a, doc_b, hamming FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      ) WHERE hamming <= 3"""
bands = "\n        UNION\n".join(
    "        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
    "          a.hi AS ah, a.lo AS al, b.hi AS bh, b.lo AS bl\n"
    f"        FROM bx a JOIN bx b ON a.b{j} = b.b{j} AND a.doc_id < b.doc_id"
    for j in range(4))
new_tail = f"""SELECT doc_a, doc_b, hamming FROM (
        WITH bx AS (
          SELECT doc_id, hi, lo,
            (hi >> 16) & 65535 AS b0, hi & 65535 AS b1,
            (lo >> 16) & 65535 AS b2, lo & 65535 AS b3
          FROM sim
        ),
        cand AS (
{bands}
        )
        SELECT doc_a, doc_b,
          CAST(bit_count(xor(ah, bh)) + bit_count(xor(al, bl)) AS BIGINT)
            AS hamming
        FROM cand
      ) WHERE hamming <= 3"""
patched("q22_dedup_simhash", tail, new_tail)

json.dump(ov, open(out, "w"), indent=1)
print(f"{len(ov)} overrides -> {out}")
