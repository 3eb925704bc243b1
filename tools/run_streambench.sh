#!/usr/bin/env bash
# Streaming throughput records (SURVEY §5d): run graft.StreamBench at
# sf1 (local[16], 2 files/trigger — the committed r8 configuration) and
# sf10 (local[32], 8 files/trigger), writing STREAMBENCH.json and
# STREAMBENCH_SF10.json. Since r11 the records carry the load-sentinel
# brackets (loadavg + calibration vs tools/calibration_ref.json), so a
# rate taken on a loaded machine names itself; check_records.py
# enforces the thresholds on the committed artifacts.
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

echo "== StreamBench at sf1 (local[16], 2 files/trigger) =="
SPARK_GRAFT_SF_DIR=testdata/sf1 SPARK_GRAFT_CPUS=16 \
  SPARK_GRAFT_STREAM_FPT=2 \
  SPARK_GRAFT_STREAMBENCH_OUT=STREAMBENCH.json \
  java $JOPTS -Xmx${SPARK_GRAFT_XMX:-48g} -cp "$CP" graft.StreamBench

echo "== StreamBench at sf10 (local[32], 8 files/trigger) =="
SPARK_GRAFT_SF_DIR=testdata/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_STREAM_FPT=8 \
  SPARK_GRAFT_STREAMBENCH_OUT=STREAMBENCH_SF10.json \
  java $JOPTS -Xmx${SPARK_GRAFT_XMX:-80g} -cp "$CP" graft.StreamBench

echo "streambench complete: STREAMBENCH.json + STREAMBENCH_SF10.json"
