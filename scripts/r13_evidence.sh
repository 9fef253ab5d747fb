#!/usr/bin/env bash
# Round-13 evidence chain (VERDICT r12 items 2-6): the last prose-only
# scale claims turned into receipts. Same crash-safety discipline as
# r10-r12: independent legs, .partial + atomic rename, set -e, per-leg
# class snapshots.
#
# Usage: scripts/r13_evidence.sh <kill2|aqeskew|disorderkill|conckill|benchlabel|counts>
set -euo pipefail
cd /root/repo
R=scripts/java_run.sh
LEG="${1:?usage: r13_evidence.sh <kill2|aqeskew|disorderkill|conckill|benchlabel|counts>}"
export CLS_SNAP="/tmp/graft_cls_r13_$LEG"
rm -rf "$CLS_SNAP"

require_corpus() {
  [ -f "$1/_SUCCESS" ] || {
    echo "FATAL: corpus $1 has no _SUCCESS marker — run r10_evidence.sh corpora first" >&2
    exit 1
  }
}

# Background watcher: once `trigger` (a directory) holds ANY content,
# wait `delay` seconds, then SIGKILL TWO executor JVMs with per-pid
# timestamps — the same-second double loss that replicated
# localCheckpoint structurally cannot survive (both replica holders can
# die together) and reliable checkpoint() must. Victims are scoped to
# CHILDREN of the given driver pid (the Execs.childExecutorPids
# discipline): an unscoped pgrep once killed a concurrent session's
# executors and measured nothing.
arm_two_executor_kill() { # trigger delay log driver_pid
  local trigger="$1" delay="$2" log="$3" drv="$4"
  (
    # Bounded wait on the trigger AND on driver liveness: a misconfigured
    # cluster (e.g. an excludeOnFailure validation error) keeps a driver
    # with zero executors alive briefly then exits — without the
    # liveness check the first kill2 attempt parked the leg's `wait` for
    # the full hour after a 30 s failure.
    local waited=0
    while [ -z "$(ls -A "$trigger" 2>/dev/null)" ]; do
      sleep 1; waited=$((waited + 1))
      if [ "$waited" -ge 3600 ]; then
        echo "# KILL2 WATCHER TIMEOUT: $trigger stayed empty" >> "$log"
        exit 0
      fi
      if ! kill -0 "$drv" 2>/dev/null; then
        echo "# KILL2 WATCHER: driver $drv gone before any checkpoint — exiting" >> "$log"
        exit 0
      fi
    done
    sleep "$delay"
    local pids n before
    pids=$(pgrep -P "$drv" -f CoarseGrainedExecutorBackend | head -2 | tr '\n' ' ' || true)
    n=$(echo "$pids" | wc -w)
    before=$(pgrep -cP "$drv" -f CoarseGrainedExecutorBackend || true)
    if [ "$n" -ge 2 ]; then
      for p in $pids; do
        kill -9 "$p"
        echo "# KILL pid=$p (child of driver $drv) at $(date -u +%FT%T.%3NZ) executors_before=$before" >> "$log"
      done
      sleep 30
      echo "# executors 30s after double kill: $(pgrep -cP "$drv" -f CoarseGrainedExecutorBackend || echo 0)" >> "$log"
    else
      echo "# KILL2 FAILED: only $n executor processes found under driver $drv" >> "$log"
    fi
  ) &
}

case "$LEG" in
  kill2)
    # VERDICT r12 item 2: multi-executor SIMULTANEOUS loss via reliable
    # checkpoint. Ckpt's scaladoc adjudicated >=2 concurrent executor
    # losses to checkpoint() on shared storage — this executes it once:
    # the checkpoint-dependent heavy queries (basket_rules' sharded
    # basket frame, graph_kcore's peeling rounds, dedup_clusters'
    # union-find rounds) run at the 100x corpus on 4 executor JVMs with
    # SPARK_GRAFT_RELIABLE_CKPT=1 swapping every catalog lineage cut to
    # reliable checkpoint() on a shared path; TWO executors are
    # SIGKILLed in the same second once the first checkpoint lands on
    # disk. The reference's multi-failure tier (tests/test-mr.sh crash
    # test kills several workers at once) re-expressed.
    require_corpus /tmp/sf10
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    QS="basket_rules,graph_kcore,dedup_clusters"
    OUT="/tmp/vout_kill2_$$"
    CKPT_DIR="/tmp/graft_ckpt_kill2_$$"
    rm -rf "$OUT" "$CKPT_DIR" /tmp/kill2_log
    mkdir -p "$CKPT_DIR"
    KCONF="spark.task.maxFailures=4"
    KCONF="$KCONF;spark.excludeOnFailure.enabled=true"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerExecutor=1"
    # local-cluster reports ONE node string (localhost) for the whole
    # fleet, so the node-level exclusion defaults (2 failed executors
    # per node, 2 task attempts per node) read a same-second double kill
    # as "the node is bad" and abort with 'cannot run anywhere'
    # (observed, first attempt). On a real multi-host cluster the two
    # victims are two hosts and these defaults never trip. Raise the
    # NODE knobs (task attempts capped at maxFailures-1 — Spark
    # validates >= as a misconfiguration and refuses executors); the
    # executor-level exclusion (the lever that matters here) stays.
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerNode=3"
    KCONF="$KCONF;spark.excludeOnFailure.stage.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.excludeOnFailure.application.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.executor.memory=11g"
    echo "# two-executor-kill rehearsal (reliable checkpoint, /tmp/sf10):" \
      "master=local-cluster[4,8,12288] conf=$KCONF" \
      "ckpt_dir=$CKPT_DIR queries=$QS" > /tmp/kill2_log
    # trigger: the first reliable checkpoint landing on the shared path
    # — the kills come AFTER a lineage cut exists, so the post-kill
    # recovery must read checkpoint files, not recompute a lineage that
    # no longer exists. The driver runs in background so its pid scopes
    # the watcher's victim selection to THIS session's executors.
    SPARK_GRAFT_MASTER="local-cluster[4,8,12288]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="$KCONF" \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
      SPARK_GRAFT_RELIABLE_CKPT=1 \
      SPARK_GRAFT_CKPT_DIR="$CKPT_DIR" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g $R graft.Verify \
      /tmp/sf10 "$OUT" "$QS" > /tmp/kill2_driver.log 2>&1 &
    DRV=$!
    arm_two_executor_kill "$CKPT_DIR" 3 /tmp/kill2_log "$DRV"
    wait "$DRV" || true
    { grep -E "\[verify\]" /tmp/kill2_driver.log || true; } | tail -8
    wait # the watcher must have fired and logged before we assemble
    grep -c "# KILL pid=" /tmp/kill2_log | grep -q "^2$"
    # the SCHEDULER must have observed the losses, not just the OS kill
    grep -m2 "Lost executor" /tmp/kill2_driver.log \
      | sed 's/^/# scheduler: /' >> /tmp/kill2_log
    grep -q "Lost executor" /tmp/kill2_driver.log
    # provenance: the run really swapped to reliable checkpoints
    echo "# reliable checkpoint rdd dirs written: $(ls -d "$CKPT_DIR"/*/rdd-* 2>/dev/null | wc -l)" >> /tmp/kill2_log
    cat /tmp/kill2_log > CORRECTNESS_kill2.txt.partial
    mkdir -p /tmp/duckspill
    python3 scripts/check_oracle.py /tmp/sf10 "$OUT" \
      >> CORRECTNESS_kill2.txt.partial || true
    tail -6 CORRECTNESS_kill2.txt.partial
    grep -q " 0 failed" CORRECTNESS_kill2.txt.partial
    # carry the full-catalog reliable-mode gate footer across re-runs
    grep "^# full-catalog reliable-mode gate" CORRECTNESS_kill2.txt \
      >> CORRECTNESS_kill2.txt.partial 2>/dev/null || true
    mv CORRECTNESS_kill2.txt.partial CORRECTNESS_kill2.txt
    rm -rf "$CKPT_DIR"
    ;;
  aqeskew)
    # VERDICT r12 item 3: SURVEY §8's "AQE for runtime skew-join
    # splitting" claim, executed. The deliberately-unsalted hot-key join
    # twin of skew_salted_join runs at the 20%-hot-key 100x corpus with
    # skewJoin enabled; the rehearsal requires OptimizeSkewedJoin to
    # have fired (numSkewedPartitions/numSkewedSplits > 0 in the FINAL
    # adaptive plan, skew=true on the join node), the result to equal
    # the salted twin's exactly, and the wall to stay within 2x of it.
    require_corpus /tmp/sf10skew
    rm -f BENCH_aqeskew.json.partial
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
      SPARK_DRIVER_MEM=24g $R graft.AqeSkewRehearsal \
      /tmp/sf10skew BENCH_aqeskew.json.partial > /tmp/aqeskew.log 2>&1 || {
        echo "AQESKEW FAILED — tail of /tmp/aqeskew.log:" >&2
        tail -30 /tmp/aqeskew.log >&2
        exit 1
      }
    grep AQESKEW /tmp/aqeskew.log || true
    python3 - <<'PYEOF'
import json
d = json.load(open('BENCH_aqeskew.json.partial'))
assert d['skewed_splits'] > 0 and d['skewed_partitions'] > 0, d
assert d['result_match'] and d['plan_has_skew_true'], d
PYEOF
    mv BENCH_aqeskew.json.partial BENCH_aqeskew.json
    ;;
  disorderkill)
    # VERDICT r12 item 4: loss × disorder. The chunk-permuted + late-row
    # replay (doc_admit_disorder) runs WITH an executor SIGKILL
    # mid-micro-batch at the half-way chunk; the two guarantees must
    # hold simultaneously through the RocksDB state reload — sink ==
    # accepted-rows twin AND numRowsDroppedByWatermark == planted.
    # The fragment is merged into STREAM_kill.json next to
    # doc_admit_kill.
    require_corpus /tmp/sf10
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    ART=STREAM_kill.json
    # keep the existing doc_admit_kill fragment: seed the .partial legs
    # from the committed artifact so the assembly carries BOTH legs
    rm -f "$ART.partial" "$ART.partial".leg_*
    KCONF="spark.task.maxFailures=4"
    KCONF="$KCONF;spark.excludeOnFailure.enabled=true"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerExecutor=1"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerNode=3"
    KCONF="$KCONF;spark.excludeOnFailure.stage.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.excludeOnFailure.application.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.executor.memory=7g"
    SPARK_GRAFT_MASTER="local-cluster[4,4,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="$KCONF" \
      SPARK_DRIVER_MEM=16g $R graft.streaming.StreamScale \
      /tmp/sf10 "$ART.partial" 60 doc_admit_disorder_kill \
      > /tmp/disorderkill.log 2>&1 || {
        echo "DISORDERKILL FAILED — tail of /tmp/disorderkill.log:" >&2
        tail -40 /tmp/disorderkill.log >&2
        exit 1
      }
    grep STREAMSCALE /tmp/disorderkill.log || true
    python3 - "$ART.partial" "$ART" <<'PYEOF'
import json, sys
new = json.load(open(sys.argv[1]))
leg = new["doc_admit_disorder_kill"]
assert leg["mismatch_rows"] == 0 and leg["batch_match"], leg
assert leg["dropped_by_watermark"] == leg["far_rows"], leg
assert leg["kill_pid"] > 0 and leg["kill_utc"], leg
# merge into the committed artifact next to doc_admit_kill
old = json.load(open(sys.argv[2]))
old["doc_admit_disorder_kill"] = leg
open(sys.argv[1], "w").write(json.dumps(old))
PYEOF
    mv "$ART.partial" "$ART"
    rm -f "$ART.partial".leg_*
    ;;
  conckill)
    # VERDICT r12 item 5: loss × concurrency. The full catalog runs
    # serially for ground-truth hashes, then 8-way under FAIR pools on
    # local-cluster; one executor is SIGKILLed once a quarter of the
    # lanes have completed (completed, in-flight, and queued lanes all
    # present at the loss), and every lane must finish with a result
    # hash equal to its serial run. The line is appended to
    # BENCH_concurrency.json as the kill-composed section.
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    KCONF="spark.task.maxFailures=4"
    KCONF="$KCONF;spark.excludeOnFailure.enabled=true"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerExecutor=1"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerNode=3"
    KCONF="$KCONF;spark.excludeOnFailure.stage.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.excludeOnFailure.application.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.executor.memory=6g"
    rm -f /tmp/conckill_line.json
    SPARK_GRAFT_MASTER="local-cluster[4,8,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="$KCONF" \
      SPARK_GRAFT_CONCURRENCY=8 \
      SPARK_DRIVER_MEM=10g $R graft.ConcurrencyKillRehearsal \
      /root/testdata/sf0.1 /tmp/conckill_line.json \
      > /tmp/conckill.log 2>&1 || {
        echo "CONCKILL FAILED — tail of /tmp/conckill.log:" >&2
        tail -30 /tmp/conckill.log >&2
        exit 1
      }
    grep CONCKILL /tmp/conckill.log || true
    python3 - <<'PYEOF'
import json
d = json.load(open('/tmp/conckill_line.json'))
assert d['mismatches'] == 0 and d['lanes_completed'] == d['n'], d
assert d['kill_pid'] > 0 and d['kill_utc'], d
PYEOF
    # append as the kill-composed section, idempotently
    grep -v '"metric":"concurrency_kill"' BENCH_concurrency.json \
      > BENCH_concurrency.json.partial || true
    cat /tmp/conckill_line.json >> BENCH_concurrency.json.partial
    mv BENCH_concurrency.json.partial BENCH_concurrency.json
    ;;
  benchlabel)
    # VERDICT r12 item 6: stale scale artifacts (BENCH_sf10.json n=161,
    # the sf1/sf3 family) predate ~117 catalog queries but read as
    # current evidence. Stamp every committed BENCH_* artifact with a
    # self-describing header: the commit+date it was recorded at, the
    # round (derived from how many CORRECTNESS_r*.json existed in that
    # commit's tree), and the query count then vs the catalog now.
    # JSONL-style artifacts get an appended header LINE (first-line
    # readers like Bench.existingSf are untouched); single-object
    # artifacts get an "artifact_header" KEY. Idempotent.
    python3 - <<'PYEOF'
import json, subprocess, glob

def git(*a):
    return subprocess.run(["git"] + list(a), capture_output=True,
                          text=True).stdout.strip()

for f in sorted(glob.glob("BENCH_*.json")):
    raw = open(f).read()
    if "artifact_header" in raw:
        print(f"{f}: already labeled"); continue
    commit = git("log", "--format=%h", "-n1", "--", f)
    date = git("log", "--format=%cI", "-n1", "--", f)
    if not commit:
        print(f"{f}: uncommitted — skipped"); continue
    import re
    m = re.match(r"BENCH_r(\d+)\.json$", f)
    if m:
        # driver round-close artifacts commit WITH their round's
        # CORRECTNESS file, so the tree-count heuristic reads one high —
        # the filename is authoritative for them
        rnd = int(m.group(1))
    else:
        tree = git("ls-tree", "--name-only", commit)
        rnd = sum(1 for l in tree.splitlines()
                  if l.startswith("CORRECTNESS_r") and l.endswith(".json")) + 1
    lines = [l for l in raw.splitlines() if l.strip()]
    # query count as recorded: the summary line's "n", else the queries map
    n_then = None
    for l in lines:
        try:
            d = json.loads(l)
        except Exception:
            d = None
        if isinstance(d, dict):
            if isinstance(d.get("n"), int):
                n_then = d["n"]; break
            if isinstance(d.get("queries"), dict):
                n_then = len(d["queries"]); break
    header = {"metric": "artifact_header", "recorded_commit": commit,
              "recorded_utc": date, "recorded_round": rnd,
              "n_queries_in_artifact": n_then,
              "catalog_n_at_labeling": 278,
              "note": "provenance stamp; the current flagship is BENCH_local.json"}
    try:
        whole = json.loads(raw)
        single = isinstance(whole, dict)
    except Exception:
        single = False
    if single:
        whole["artifact_header"] = header
        # COMPACT separators, one line: Bench.existingSf reads the
        # first line with a `"sf":"…"` (no-space) regex, and the
        # cross-sf overwrite guard must keep seeing labeled artifacts
        open(f, "w").write(json.dumps(whole, separators=(",", ":")) + "\n")
    else:
        open(f, "a").write(json.dumps(header) + "\n")
    print(f"{f}: labeled round={rnd} n_then={n_then} commit={commit}")
PYEOF
    ;;
  counts)
    exec scripts/r11_evidence.sh counts
    ;;
  *)
    echo "unknown leg $LEG" >&2; exit 1
    ;;
esac
