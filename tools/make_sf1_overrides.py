#!/usr/bin/env python3
"""Build sf1 oracle overrides: semantically-EQUAL rewrites of the oracle
SQLs whose committed form is prohibitive in DuckDB at sf1. The committed
oracles are deliberately structurally simple (all-pairs joins, unrolled
iterative CTE chains) — that simplicity is the point of an independent
check at the driver's sf0.01, and the overrides keep the SAME semantics
while removing only DuckDB-side evaluation pathologies. Two classes:

1. EVALUATION HINTS (no structural change): DuckDB inlines every CTE
   referenced fewer than N times; the unrolled iterative chains (kmeans,
   PQ, PageRank, power iteration) reference each previous round TWICE
   (assignment + carry-over LEFT JOIN), so inlining expands the chain
   ~2^rounds times — q32 runs 43 s at sf1 and the composed q88 replay
   never finishes. `AS MATERIALIZED` evaluates each CTE once, exactly as
   written. Measured at sf1: q32 43->7 s, q45 63->15 s, q53 >90->11 s,
   q96 >90->2.6 s, q90 >90->57 s. (q82 is the counter-example: mat made
   it SLOWER, 42->235 s — its cost is the ADC join itself, class 2.)

2. STRUCTURAL REWRITES, each with an exactness argument:
   - Postings-join Jaccard/containment (q21/q23/q41/q73/q79): explode
     the (already list_distinct'd) n-gram lists, equi-join on the gram,
     COUNT(*) = |A∩B|, and |A∪B| = |A|+|B|-|A∩B|. Produces a row for
     EXACTLY the pairs with >=1 shared gram; every dropped pair has
     J = containment = 0, strictly below each query's threshold
     (0.5 / 0.02 / 0.5 / 0.5 / 0.5), so the post-filter output is
     identical. The scores are the same integer counts in the same
     double division, hence bit-identical. No generator assumption —
     unlike the old stride-block overrides, this is exact on ANY corpus
     (the ~r token suffixing merely makes it FAST, because cross-copy
     grams never collide).
   - Native inner product (q30): list_inner_product(DOUBLE[], DOUBLE[])
     replaces the interpreted lambda reduce. Both sum left-to-right in
     double, verified bit-identical on all 2M sf0.1 pairs; at sf1 the
     200M-pair scan drops >90 s (interpreted) -> ~4 s.
   - ADC lookup table (q82/q88): precompute lut(probe, sub, code) = the
     int64 partial distance once (n_probes x 8 x 16 rows), then join
     codes against the LUT and SUM the 8 integers per (probe, neighbor)
     — the same 8 integers the committed per-row list_sum computes, so
     the BIGINT total is identical. This is also exactly how the Spark
     side evaluates ADC, but here it is only an evaluation strategy for
     the same algebra; the committed sf0.01 replay stays join-free of
     engine structure.
   - Band pigeonhole (q22, unchanged from r6): hamming(a,b) <= 3 over
     64 bits implies agreement on >= 1 of four 16-bit bands, so a UNION
     of four band equi-joins is a candidate SUPERSET; the unchanged
     exact hamming filter reproduces the original semantics with no
     generator assumption.

Usage: make_sf1_overrides.py <oracle_sql.json> <out.json>
"""
import json
import re
import sys


def mat(sql, skip=()):
    """name AS ( -> name AS MATERIALIZED ( for every top-level CTE.
    The pattern only matches an identifier directly followed by AS and
    an opening paren — column aliases (`) AS x`, `AS BIGINT)`) never
    parse that way. `skip` exempts recursive CTEs, which DuckDB cannot
    materialize."""
    def repl(m):
        name = m.group(1)
        if name in skip:
            return m.group(0)
        return f"{name} AS MATERIALIZED ("
    return re.sub(r"\b([a-zA-Z_]\w*)\s+AS\s*\(", repl, sql)


TRI_CTE = """t AS MATERIALIZED (
        SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       for i in range(1, len(w) - 1)]) AS tri
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )"""


def main():
    src, out = sys.argv[1], sys.argv[2]
    d = json.load(open(src))
    ov = {}

    def guard(name, *markers):
        """Fail loudly if the committed oracle drifted away from the
        semantics this override re-expresses."""
        for mk in markers:
            assert mk in d[name], f"{name}: marker {mk!r} not found"

    # -- class 1: pure materialization hints ---------------------------
    for name in ("q32_kmeans", "q45_ann_ivf", "q53_pagerank",
                 "q90_semantic_dedup", "q96_pca_power"):
        ov[name] = mat(d[name])

    # -- q21: postings-join Jaccard ------------------------------------
    guard("q21_dedup_minhash", ">= 0.5", "list_intersect")
    ov["q21_dedup_minhash"] = f"""
      WITH {TRI_CTE},
      sz AS MATERIALIZED (SELECT doc_id, len(tri) AS n FROM t),
      tok AS MATERIALIZED (SELECT doc_id, unnest(tri) AS g FROM t),
      ins AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT i.doc_a, i.doc_b,
          CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
        FROM ins i
        JOIN sz sa ON i.doc_a = sa.doc_id
        JOIN sz sb ON i.doc_b = sb.doc_id
      ) WHERE jaccard >= 0.5
    """

    # -- q23: postings-join Jaccard within (lang, source) --------------
    guard("q23_ngram_jaccard", ">= 0.02", "a.lang = b.lang")
    ov["q23_ngram_jaccard"] = """
      WITH t AS MATERIALIZED (
        SELECT doc_id, lang, source,
          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in range(1, len(w) - 1)]) AS tri
        FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents)
      ),
      sz AS MATERIALIZED (SELECT doc_id, len(tri) AS n FROM t),
      tok AS MATERIALIZED (
        SELECT doc_id, lang, source, unnest(tri) AS g FROM t
      ),
      ins AS MATERIALIZED (
        SELECT a.lang AS lang, a.source AS source,
          a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM tok a JOIN tok b
          ON a.g = b.g AND a.lang = b.lang AND a.source = b.source
          AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
      )
      SELECT lang, source, doc_a, doc_b, jaccard FROM (
        SELECT i.lang, i.source, i.doc_a, i.doc_b,
          CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
        FROM ins i
        JOIN sz sa ON i.doc_a = sa.doc_id
        JOIN sz sb ON i.doc_b = sb.doc_id
      ) WHERE jaccard >= 0.02
    """

    # -- q73: postings-join batch-vs-index near-dup --------------------
    # The len(tri) > 0 guards in the committed join only exclude 0/0
    # NaN scores; postings pairs always have both sides non-empty, and
    # excluded pairs score j = 0 < 0.5 either way.
    guard("q73_incremental_dedup", "doc_id % 10 = 0", ">= 0.5")
    ov["q73_incremental_dedup"] = f"""
      WITH {TRI_CTE.replace("SELECT doc_id, list_distinct", "SELECT doc_id, text, list_distinct").replace("SELECT doc_id, string_split", "SELECT doc_id, text, string_split")},
      b AS MATERIALIZED (SELECT * FROM t WHERE doc_id % 10 = 0),
      ix AS MATERIALIZED (SELECT * FROM t WHERE doc_id % 10 <> 0),
      ex AS (
        SELECT b.doc_id, COUNT(*) AS exact_hits
        FROM b JOIN ix ON b.text = ix.text GROUP BY 1
      ),
      tb AS MATERIALIZED (SELECT doc_id, unnest(tri) AS g FROM b),
      ti AS MATERIALIZED (SELECT doc_id, unnest(tri) AS g FROM ix),
      ins AS MATERIALIZED (
        SELECT tb.doc_id AS bid, ti.doc_id AS iid, COUNT(*) AS inter
        FROM tb JOIN ti ON tb.g = ti.g GROUP BY 1, 2
      ),
      nd AS (
        SELECT doc_id, COUNT(*) AS near_dups, MAX(j) AS max_jaccard FROM (
          SELECT i.bid AS doc_id,
            CAST(i.inter AS DOUBLE) /
              (len(bb.tri) + len(xx.tri) - i.inter) AS j
          FROM ins i
          JOIN b bb ON i.bid = bb.doc_id
          JOIN ix xx ON i.iid = xx.doc_id
        ) WHERE j >= 0.5 GROUP BY 1
      )
      SELECT b.doc_id,
        (ex.exact_hits IS NOT NULL) AS dup_exact,
        CAST(COALESCE(nd.near_dups, 0) AS BIGINT) AS near_dups,
        nd.max_jaccard,
        (ex.exact_hits IS NOT NULL OR nd.near_dups IS NOT NULL) AS is_dup
      FROM b LEFT JOIN ex ON b.doc_id = ex.doc_id
      LEFT JOIN nd ON b.doc_id = nd.doc_id
    """

    # -- q79: postings-join containment --------------------------------
    # The committed p CTE already keeps only len(list_intersect) > 0,
    # which is exactly the postings support.
    guard("q79_containment", "w[i+3]", ">= 0.5")
    ov["q79_containment"] = """
      WITH t AS MATERIALIZED (
        SELECT doc_id,
          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                         for i in range(1, len(w) - 2)]) AS ng
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ),
      tok AS MATERIALIZED (SELECT doc_id, unnest(ng) AS g FROM t),
      ins AS MATERIALIZED (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      p AS (
        SELECT i.da, i.db, CAST(i.inter AS BIGINT) AS inter,
          CAST(len(ta.ng) AS BIGINT) AS na, CAST(len(tb.ng) AS BIGINT) AS nb
        FROM ins i
        JOIN t ta ON i.da = ta.doc_id
        JOIN t tb ON i.db = tb.doc_id
      )
      SELECT doc_src, doc_tgt, inter, size_src,
        CAST(inter AS DOUBLE) / size_src AS containment
      FROM (
        SELECT da AS doc_src, db AS doc_tgt, inter, na AS size_src FROM p
        UNION ALL
        SELECT db AS doc_src, da AS doc_tgt, inter, nb AS size_src FROM p
      ) WHERE CAST(inter AS DOUBLE) / size_src >= 0.5
    """

    # -- q41: postings edges + recursive closure (reach NOT mat) -------
    guard("q41_dedup_pipeline", "WITH RECURSIVE", ">= 0.5")
    ov["q41_dedup_pipeline"] = f"""
      WITH RECURSIVE
      {TRI_CTE.replace("SELECT doc_id, list_distinct", "SELECT doc_id, text, list_distinct").replace("SELECT doc_id, string_split", "SELECT doc_id, text, string_split")},
      exact_pairs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM t a JOIN t b ON a.text = b.text AND a.doc_id <> b.doc_id
      ),
      sz AS MATERIALIZED (SELECT doc_id, len(tri) AS n FROM t),
      tok AS MATERIALIZED (SELECT doc_id, unnest(tri) AS g FROM t),
      ins AS MATERIALIZED (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      near_pairs AS (
        SELECT i.da AS src, i.db AS dst
        FROM ins i
        JOIN sz sa ON i.da = sa.doc_id
        JOIN sz sb ON i.db = sb.doc_id
        WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
      ),
      edges AS MATERIALIZED (
        SELECT src, dst FROM exact_pairs
        UNION SELECT src, dst FROM near_pairs
        UNION SELECT dst, src FROM near_pairs
      ),
      reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      ),
      rep AS (
        SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS rep
        FROM t d LEFT JOIN reach r ON r.src = d.doc_id
        GROUP BY d.doc_id
      )
      SELECT COUNT(*) AS docs,
        CAST(SUM(CASE WHEN rep = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        CAST(SUM(CASE WHEN rep <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS removed_docs,
        COUNT(DISTINCT rep) AS clusters
      FROM rep
    """

    # -- q30: native double inner product ------------------------------
    guard("q30_dedup_embedding", ">= 0.3")
    ov["q30_dedup_embedding"] = """
      WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de,
          sqrt(list_reduce(
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            (a, b) -> a + b)) AS norm
        FROM embeddings
      )
      SELECT vec_a, vec_b, cosine FROM (
        SELECT p.vec_id AS vec_a, n.vec_id AS vec_b,
          list_inner_product(p.de, n.de) / (p.norm * n.norm) AS cosine
        FROM e p JOIN e n ON p.vec_id < n.vec_id
      ) WHERE cosine >= 0.3
    """

    # -- q82 / q88: ADC via lookup table -------------------------------
    LUT = """lut AS MATERIALIZED (
        SELECT p.vec_id AS probe_id, p.sub, c.code,
          CAST(list_sum(list_transform(range(1, 9),
            j -> (p.sq[j]-c.cq[j])*(p.sq[j]-c.cq[j]))) AS BIGINT) AS pd
        FROM vs p JOIN pc3 c ON p.sub = c.sub
        WHERE p.vec_id % 50 = 0
      ),
      """

    old82 = """adc AS (
        SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
          CAST(SUM(list_sum(list_transform(range(1, 9), j -> (p.sq[j]-cb.cq[j])*(p.sq[j]-cb.cq[j])))) AS BIGINT) AS adc_dist
        FROM vs p
        JOIN enc e ON p.sub = e.sub
        JOIN pc3 cb ON cb.sub = e.sub AND cb.code = e.code
        WHERE p.vec_id % 50 = 0 AND e.vec_id <> p.vec_id
        GROUP BY 1, 2
      ),"""
    new82 = LUT + """adc AS (
        SELECT l.probe_id, e.vec_id AS neighbor_id,
          CAST(SUM(l.pd) AS BIGINT) AS adc_dist
        FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
        WHERE e.vec_id <> l.probe_id
        GROUP BY 1, 2
      ),"""
    assert old82 in d["q82_pq_ann"], "q82: adc CTE drifted"
    ov["q82_pq_ann"] = d["q82_pq_ann"].replace(old82, new82)

    old88 = """adc AS (
        SELECT ca.probe_id, ca.neighbor_id,
          CAST(SUM(list_sum(list_transform(range(1, 9), j -> (p.sq[j]-cb.cq[j])*(p.sq[j]-cb.cq[j])))) AS BIGINT) AS adc_dist
        FROM cand ca
        JOIN vs p ON p.vec_id = ca.probe_id
        JOIN enc e ON e.vec_id = ca.neighbor_id AND e.sub = p.sub
        JOIN pc3 cb ON cb.sub = e.sub AND cb.code = e.code
        GROUP BY 1, 2
      ),"""
    new88 = LUT + """adc AS (
        SELECT ca.probe_id, ca.neighbor_id,
          CAST(SUM(l.pd) AS BIGINT) AS adc_dist
        FROM cand ca
        JOIN enc e ON e.vec_id = ca.neighbor_id
        JOIN lut l ON l.probe_id = ca.probe_id AND l.sub = e.sub
          AND l.code = e.code
        GROUP BY 1, 2
      ),"""
    assert old88 in d["q88_ivfpq_probe"], "q88: adc CTE drifted"
    ov["q88_ivfpq_probe"] = mat(d["q88_ivfpq_probe"].replace(old88, new88))

    # -- q22: band pigeonhole (unchanged from r6) ----------------------
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
    assert tail in d["q22_dedup_simhash"], "q22: tail drifted"
    ov["q22_dedup_simhash"] = d["q22_dedup_simhash"].replace(tail, new_tail)

    json.dump(ov, open(out, "w"), indent=1)
    print(f"{len(ov)} overrides -> {out}")


if __name__ == "__main__":
    main()
