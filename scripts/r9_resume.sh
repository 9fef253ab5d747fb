#!/usr/bin/env bash
# Resume of scripts/r9_evidence.sh after a session restart killed it at
# step 3: the sf10/sf10skew corpora are already on disk (ScaleGen
# unchanged since they were generated), so only the verify/gate/bench/
# stream legs run. Fresh class snapshot is taken from HEAD first.
set -uo pipefail
cd /root/repo
R=scripts/java_run.sh
export CLS_SNAP=/tmp/graft_cls
rm -rf "$CLS_SNAP"

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

echo "=== resume chain done"
