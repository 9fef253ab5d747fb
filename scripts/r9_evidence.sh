#!/usr/bin/env bash
# Round-9 scale-evidence chain (VERDICT r8 items 4 + 5):
#   1. regenerate the uniform and SKEWED 100x rehearsal corpora
#   2. full-catalog Verify + DuckDB gate on the skewed 100x corpus
#   3. full-catalog Bench on the skewed 100x corpus -> BENCH_sf10skew.json
#   4. StreamScale's five legs over the uniform sf10 events -> STREAM_sf10.json
# Runs via scripts/java_run.sh (snapshotted classes, no sbt lock).
set -uo pipefail
cd /root/repo
R=scripts/java_run.sh
export CLS_SNAP=/tmp/graft_cls
rm -rf "$CLS_SNAP"

echo "=== [1/6] ScaleGen uniform x100 -> /tmp/sf10"
rm -rf /tmp/sf10
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g $R graft.ScaleGen \
  /root/testdata/sf0.1 /tmp/sf10 100 uniform 2>&1 | tail -2

echo "=== [2/6] ScaleGen skew x100 -> /tmp/sf10skew"
rm -rf /tmp/sf10skew
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g $R graft.ScaleGen \
  /root/testdata/sf0.1 /tmp/sf10skew 100 skew 2>&1 | tail -2

echo "=== [3/6] Verify full catalog at sf10skew"
rm -rf /tmp/vout_sf10skew
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g $R graft.Verify \
  /tmp/sf10skew /tmp/vout_sf10skew 2>&1 | grep -E "\[verify\]" | tail -5

echo "=== [4/6] DuckDB gate at sf10skew"
python3 scripts/check_oracle.py /tmp/sf10skew /tmp/vout_sf10skew 2>&1 | tail -8

echo "=== [5/6] Bench full catalog at sf10skew -> BENCH_sf10skew.json"
SPARK_GRAFT_SF_DIR=/tmp/sf10skew SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10skew.json $R graft.Bench 2>&1 | tail -1

echo "=== [6/6] StreamScale over sf10 events -> STREAM_sf10.json"
SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g $R graft.streaming.StreamScale \
  /tmp/sf10 STREAM_sf10.json 120 2>&1 | tail -3

echo "=== evidence chain done"
