#!/usr/bin/env bash
# One-command sf1 scale-step gate: regenerate the 10x corpus, dump every
# SparkEntry query at sf1, replay every oracle in DuckDB (with the
# documented semantically-equal sf1 overrides), and bench. Writes the
# committed artifacts:
#   CORRECTNESS_SF1.json  per-query rows/schema/hash record (+ oracle
#                         seconds and whether an override was used)
#   BENCH_SF1.json        per-query median/min/max seconds at sf1
# Run from anywhere; ~15 min end-to-end on 32 cores.
set -euo pipefail
cd "$(dirname "$0")/.."
# pre-flight: sweep orphaned Spark temp debris, record disk headroom
source tools/disk_hygiene.sh

SF1=testdata/sf1
OUT=${SF1_VERIFY_OUT:-/tmp/verify_sf1_gate}
CPUS=${SPARK_GRAFT_CPUS:-32}
# Frozen-jar classpath: a long-running gate JVM loads classes lazily, so
# running `sbt compile` mid-gate would swap class files under it. The jar
# is written once by `sbt package` and untouched by later compiles.
JAR=$(ls target/scala-2.13/*_2.13-*.jar 2>/dev/null | head -1)
CP="$JAR:/opt/spark/jars/*"
# Spark 4.x on JDK 17 outside spark-submit needs the module opens from
# build.sbt's jdk17AddOpens — WITHOUT them the first memory-pressure
# block eviction dies in Kryo (FieldSerializer for HeapByteBuffer),
# which only surfaces at scale factors big enough to evict.
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
[ -f "$SF1/_GRAFT_COMPLETE" ] || python3 tools/gen_sf1.py
sbt -batch package
JAR=$(ls target/scala-2.13/*_2.13-*.jar | head -1); CP="$JAR:/opt/spark/jars/*"

echo "== Spark-side dumps at sf1 =="
SPARK_GRAFT_CPUS=$CPUS java $JOPTS -Xmx48g -cp "$CP" graft.Verify "$PWD/$SF1" "$OUT"

echo "== DuckDB oracle gate =="
python3 tools/make_sf1_overrides.py "$OUT/oracle_sql.json" "$OUT/sf1_overrides.json"
python3 tools/check_oracle.py "$SF1" "$OUT" "$OUT/sf1_overrides.json" CORRECTNESS_SF1.json

echo "== Bench at sf1 =="
SPARK_GRAFT_SF_DIR="$PWD/$SF1" SPARK_GRAFT_CPUS=$CPUS \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF1.json \
  java $JOPTS -Xmx48g -cp "$CP" graft.Bench

echo "sf1 gate complete: CORRECTNESS_SF1.json + BENCH_SF1.json"
