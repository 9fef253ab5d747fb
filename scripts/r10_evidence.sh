#!/usr/bin/env bash
# Round-10 scale-evidence chain (VERDICT r9 items 1-4), crash-safe:
#   - every leg is invoked INDEPENDENTLY (usage below) and is re-runnable:
#     killing any leg mid-run and re-invoking produces correct artifacts
#     with no manual cleanup;
#   - corpora carry a _SUCCESS marker written only after a clean
#     generation + atomic directory rename — later legs REFUSE to trust
#     an unmarked corpus (the r9 failure: a half-regenerated /tmp/sf10
#     silently fed the stream leg);
#   - every repo artifact is written to a .partial temp path and
#     atomically renamed only on leg success;
#   - set -e: any failed step aborts the leg loudly (r9 scripts ran
#     later legs after failures and still printed "done");
#   - each leg snapshots classes into its OWN dir so a re-snapshot for
#     one leg can never pull class files out from under another.
#
# Usage: scripts/r10_evidence.sh <corpora|gate|bench|stream|benchlocal>
set -euo pipefail
cd /root/repo
R=scripts/java_run.sh
LEG="${1:?usage: r10_evidence.sh <corpora|gate|bench|stream|benchlocal>}"
export CLS_SNAP="/tmp/graft_cls_$LEG"
rm -rf "$CLS_SNAP"

gen_corpus() { # mode outdir
  local mode="$1" out="$2"
  if [ -f "$out/_SUCCESS" ]; then
    echo "corpus $out already generated (marker present) — skipping"
    return 0
  fi
  rm -rf "$out" "$out.partial"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g $R graft.ScaleGen \
    /root/testdata/sf0.1 "$out.partial" 100 "$mode" 2>&1 | tail -2
  mv "$out.partial" "$out"
  touch "$out/_SUCCESS"
  echo "corpus $out OK"
}

require_corpus() {
  [ -f "$1/_SUCCESS" ] || {
    echo "FATAL: corpus $1 has no _SUCCESS marker — run the corpora leg first" >&2
    exit 1
  }
}

case "$LEG" in
  corpora)
    gen_corpus uniform /tmp/sf10
    gen_corpus skew /tmp/sf10skew
    ;;
  gate)
    require_corpus /tmp/sf10skew
    # oracle_sql.json is written LAST by Verify, so its presence marks a
    # complete dump — skip the ~65-min Verify on re-run (delete the dir
    # to force). The failure-line grep must tolerate ZERO matches: under
    # pipefail a clean Verify (no "[verify] ... failed" lines) made grep
    # exit 1 and set -e aborted the leg BEFORE check_oracle — the r10
    # first run died of its own success.
    if [ ! -f /tmp/vout_sf10skew/oracle_sql.json ]; then
      rm -rf /tmp/vout_sf10skew
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g $R graft.Verify \
        /tmp/sf10skew /tmp/vout_sf10skew 2>&1 \
        | { grep -E "\[verify\]" || true; } | tail -5
    else
      echo "verify dump already complete (oracle_sql.json present) — skipping"
    fi
    python3 scripts/check_oracle.py /tmp/sf10skew /tmp/vout_sf10skew \
      > CORRECTNESS_sf10skew.txt.partial
    tail -3 CORRECTNESS_sf10skew.txt.partial
    mv CORRECTNESS_sf10skew.txt.partial CORRECTNESS_sf10skew.txt
    ;;
  bench)
    require_corpus /tmp/sf10skew
    SPARK_GRAFT_SF_DIR=/tmp/sf10skew SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_BENCH_OUT=BENCH_sf10skew.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_sf10skew.json.partial BENCH_sf10skew.json
    ;;
  stream)
    echo "DEPRECATED: this leg filtered+clobbered fragments (r10 recovery bug);" >&2
    echo "use scripts/r11_evidence.sh stream — reuse-before-filter, registry-counted." >&2
    exit 1
    require_corpus /tmp/sf10
    # full log kept (the first r10 run's crash was undiagnosable after
    # `| tail -3` ate the stack trace); per-leg fragments persist as
    # STREAM_sf10.json.partial.leg_* and are reused on re-run, so a
    # crash costs exactly the leg that crashed. Optional $2 = legs
    # filter passed through (e.g. rolling_avg_ttl).
    SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g $R graft.streaming.StreamScale \
      /tmp/sf10 STREAM_sf10.json.partial "${STREAM_CHUNKS:-120}" ${2:-} \
      > /tmp/streamscale_sf10.log 2>&1 || {
        echo "STREAMSCALE FAILED — tail of /tmp/streamscale_sf10.log:" >&2
        tail -40 /tmp/streamscale_sf10.log >&2
        exit 1
      }
    grep STREAMSCALE /tmp/streamscale_sf10.log || true
    mv STREAM_sf10.json.partial STREAM_sf10.json
    ;;
  benchlocal)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_BENCH_OUT=BENCH_local.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_local.json.partial BENCH_local.json
    ;;
  *)
    echo "unknown leg: $LEG" >&2
    exit 1
    ;;
esac
echo "LEG $LEG OK"
