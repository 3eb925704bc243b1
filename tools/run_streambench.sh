#!/usr/bin/env bash
# Streaming throughput records (SURVEY §5d): run graft.StreamBench at
# sf1 (local[16], 2 files/trigger) and sf10 (local[32], 8
# files/trigger), writing STREAMBENCH.json and STREAMBENCH_SF10.json.
# Since r12 the feed is DETERMINISTIC (fixed event-time slices, pinned
# mtimes — the r8-vs-r11 state-mark drift was the range partitioner's
# sampled file boundaries) and the state backend is RocksDB with
# changelog checkpointing (the production backend for dedup-scale
# state; the committed config after the r12 A/B: hdfs/retain=2 488 MB,
# hdfs/retain=1 358 MB, rocksdb 134 MB near-dedup state at sf1). Since
# r11 the records carry the load-sentinel brackets (loadavg +
# calibration vs tools/calibration_ref.json), so a rate taken on a
# loaded machine names itself; check_records.py enforces the
# thresholds on the committed artifacts.
#
# Prereq: testdata/sf1 and testdata/sf10 generated (the sf1/sf10 gates
# create them); ~2 GiB of target/streambench scratch per run.
set -euo pipefail
cd "$(dirname "$0")/.."
source tools/disk_hygiene.sh

JAR=$(ls target/scala-2.13/*_2.13-*.jar 2>/dev/null | head -1)
[ -n "$JAR" ] || { sbt -batch package; JAR=$(ls target/scala-2.13/*_2.13-*.jar | head -1); }
CP="$JAR:/opt/spark/jars/*"
JOPTS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic; do
  printf -- "--add-opens=java.base/%s=ALL-UNNAMED " "$p"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  printf -- "--add-opens=java.base/%s=ALL-UNNAMED " "$p"
done)

echo "== StreamBench at sf1 (local[16], 2 files/trigger, 16/8 slices) =="
SPARK_GRAFT_SF_DIR=testdata/sf1 SPARK_GRAFT_CPUS=16 \
  SPARK_GRAFT_STREAM_FPT=2 \
  SPARK_GRAFT_STREAM_SLICES=16 SPARK_GRAFT_STREAM_SLICES_EVENTS=8 \
  SPARK_GRAFT_STREAM_STATESTORE=rocksdb \
  SPARK_GRAFT_STREAMBENCH_OUT=STREAMBENCH.json \
  java $JOPTS -Xmx${SPARK_GRAFT_XMX:-48g} -cp "$CP" graft.StreamBench

echo "== StreamBench at sf10 (local[32], 8 files/trigger, 128/32 slices) =="
SPARK_GRAFT_SF_DIR=testdata/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_STREAM_FPT=8 \
  SPARK_GRAFT_STREAM_SLICES=128 SPARK_GRAFT_STREAM_SLICES_EVENTS=32 \
  SPARK_GRAFT_STREAM_STATESTORE=rocksdb \
  SPARK_GRAFT_STREAMBENCH_OUT=STREAMBENCH_SF10.json \
  java $JOPTS -Xmx${SPARK_GRAFT_XMX:-80g} -cp "$CP" graft.StreamBench

echo "streambench complete: STREAMBENCH.json + STREAMBENCH_SF10.json"
