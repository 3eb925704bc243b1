#!/usr/bin/env bash
# Pre-flight disk hygiene for scale runs (source me, don't exec):
# a hard-killed Spark JVM skips its shutdown hooks and leaves
# /tmp/blockmgr-* and /tmp/spark-* behind — round 8's judge found a
# stale 46 GB block-manager tree silently eating the sandbox's disk
# budget, enough on its own to push a legitimate sf100 run into
# ENOSPC. Sweep orphans when no graft/Spark JVM is live, and print
# the df headroom so a disk-constrained record is self-diagnosing.
#
# Provides: disk_free_gb (echoes integer GiB free on /tmp's fs) and
# performs the sweep at source time.

disk_free_gb() {
  df -BG --output=avail /tmp | tail -1 | tr -dc '0-9'
}

# only sweep when nothing Spark-shaped is running: a live JVM's temp
# dirs are indistinguishable from debris by name alone
if pgrep -f 'java.*(graft|spark)' >/dev/null 2>&1; then
  echo "disk_hygiene: live Spark/graft JVM detected — skipping /tmp sweep" >&2
else
  swept_mb=0
  for d in /tmp/blockmgr-* /tmp/spark-* /tmp/graft-*; do
    [ -e "$d" ] || continue
    sz=$(du -sm "$d" 2>/dev/null | cut -f1 | tr -dc '0-9')
    rm -rf "$d" 2>/dev/null && swept_mb=$((swept_mb + ${sz:-0}))
  done
  [ "$swept_mb" -gt 0 ] && \
    echo "disk_hygiene: swept ~${swept_mb} MiB of orphaned Spark temp dirs" >&2
fi
echo "disk_hygiene: $(disk_free_gb) GiB free on /tmp before run" >&2
