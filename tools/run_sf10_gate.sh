#!/usr/bin/env bash
# 100x CORRECTNESS gate: dump every SparkEntry query at sf10 and replay
# every oracle in DuckDB (with the same documented semantically-equal
# overrides the sf1 gate uses — tools/make_sf1_overrides.py carries the
# per-query exactness arguments, and tools/check_override_equiv.py
# proves each override == committed oracle at sf0.01 AND sf0.1).
# Writes the committed artifact:
#   CORRECTNESS_SF10.json  per-query rows/schema/hash record
#
# Skips, never silent (recorded as skipped_at_scale in the artifact):
#   q24_ann_bruteforce, q30_dedup_embedding — quadratic BY CONSTRUCTION
#   on both engines (the same exclusions the sf10 bench documents);
#   plus SF10_ORACLE_SKIP for oracle replays measured impractical at
#   this scale. Default: q82_pq_ann — flat PQ is exhaustive ADC by
#   DECLARED semantics, so its replay aggregates ~6.4e9 (probe,
#   neighbor, sub) rows at sf10 and spilled DuckDB temp past the disk
#   (its indexed counterpart q88 IS gated here: 40k rows exact). It
#   stays oracle-proven at sf0.01/sf0.1/sf1.
#   q90_semantic_dedup is GATED since the two-level quantizer landed:
#   the flat replay's assignment crossed 200k vectors x 800 cells per
#   round (~90 GB of temp, disk-full); the two-level chain scores
#   ~sqrt(k) centroids per vector per level and replays in ~19 min
#   (measured, 815 rows exact).
#
# Heap: ~80 GiB default, override with SPARK_GRAFT_XMX. Expect ~1 h
# end-to-end on 32 cores (the Spark dump dominates; DuckDB replays the
# 95 oracles in ~30 min).
set -euo pipefail
cd "$(dirname "$0")/.."
# pre-flight: sweep orphaned Spark temp debris, record disk headroom
source tools/disk_hygiene.sh

SF10=testdata/sf10
OUT=${SF10_VERIFY_OUT:-/tmp/verify_sf10_gate}
CPUS=${SPARK_GRAFT_CPUS:-32}
# Frozen-jar classpath: a long-running gate JVM loads classes lazily, so
# running `sbt compile` mid-gate would swap class files under it. The jar
# is written once by `sbt package` and untouched by later compiles.
JAR=$(ls target/scala-2.13/*_2.13-*.jar 2>/dev/null | head -1)
CP="$JAR:/opt/spark/jars/*"
JOPTS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic; do
  printf -- "--add-opens=java.base/%s=ALL-UNNAMED " "$p"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  printf -- "--add-opens=java.base/%s=ALL-UNNAMED " "$p"
done)

# _GRAFT_COMPLETE is written as the generator's LAST step - a bare
# directory check would accept an interrupted half-generated corpus.
[ -f "$SF10/_GRAFT_COMPLETE" ] || python3 tools/gen_sf1.py /root/testdata/sf0.1 "$SF10" 100
sbt -batch package
JAR=$(ls target/scala-2.13/*_2.13-*.jar | head -1); CP="$JAR:/opt/spark/jars/*"

SKIP=q24_ann_bruteforce,q30_dedup_embedding

echo "== Spark-side dumps at sf10 =="
SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_VERIFY_SKIP=$SKIP \
  java $JOPTS -Xmx${SPARK_GRAFT_XMX:-80g} -cp "$CP" graft.Verify "$PWD/$SF10" "$OUT"

echo "== DuckDB oracle gate at sf10 =="
python3 tools/make_sf1_overrides.py "$OUT/oracle_sql.json" "$OUT/sf10_overrides.json"
# merge the Spark-side skips with any oracle-impractical additions
python3 - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
skips = set(json.load(open(f"{out}/skipped.json")))
skips |= {s for s in
          os.environ.get("SF10_ORACLE_SKIP", "q82_pq_ann").split(",") if s}
json.dump(sorted(skips), open(f"{out}/gate_skips.json", "w"))
EOF
python3 tools/check_oracle.py "$SF10" "$OUT" "$OUT/sf10_overrides.json" \
  CORRECTNESS_SF10.json "$OUT/gate_skips.json"

echo "sf10 gate complete: CORRECTNESS_SF10.json"
