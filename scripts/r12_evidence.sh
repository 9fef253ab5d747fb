#!/usr/bin/env bash
# Round-12 evidence chain (VERDICT r11 items 1-6), same crash-safety
# discipline as r10/r11: independent legs, .partial + atomic rename,
# set -e, per-leg class snapshots.
#
# Usage: scripts/r12_evidence.sh <killone|killfull|sf10gate|streamadd12|benchlocal|clusterbench|sf10cluster|streamkill|straggler|driverkill|decommission|counts>
set -euo pipefail
cd /root/repo
R=scripts/java_run.sh
LEG="${1:?usage: r12_evidence.sh <killone|killfull|sf10gate|streamadd12|benchlocal|clusterbench|sf10cluster|streamkill|straggler|driverkill|decommission|counts>}"
export CLS_SNAP="/tmp/graft_cls_r12_$LEG"
rm -rf "$CLS_SNAP"

require_corpus() {
  [ -f "$1/_SUCCESS" ] || {
    echo "FATAL: corpus $1 has no _SUCCESS marker — run r10_evidence.sh corpora first" >&2
    exit 1
  }
}

# Background watcher: once `trigger` exists, wait `delay` seconds, then
# SIGKILL one executor JVM (CoarseGrainedExecutorBackend — a real child
# PROCESS under local-cluster, never the driver). Records the kill
# timestamp, pid, and output-dir progress into `log`, then 30 s later
# records the surviving/respawned executor count (the standalone master
# relaunches a lost executor; either way the QUERY must finish green).
arm_executor_kill() { # trigger delay log outdir
  local trigger="$1" delay="$2" log="$3" outdir="$4"
  (
    # bounded wait: if the driver dies before the trigger materializes,
    # the watcher must EXIT (and log) rather than park `wait` forever
    local waited=0
    while [ ! -e "$trigger" ]; do
      sleep 1; waited=$((waited + 1))
      if [ "$waited" -ge 3600 ]; then
        echo "# KILL WATCHER TIMEOUT: trigger $trigger never appeared" >> "$log"
        exit 0
      fi
    done
    sleep "$delay"
    local pid
    pid=$(pgrep -f CoarseGrainedExecutorBackend | head -1 || true)
    if [ -n "$pid" ]; then
      local before progress
      before=$(pgrep -fc CoarseGrainedExecutorBackend || true)
      progress=$(ls -1d "$outdir"/*/ 2>/dev/null | wc -l)
      echo "# KILL pid=$pid at $(date -u +%FT%TZ) executors_before=$before" \
        "query_dirs_done=$progress trigger=$(basename "$trigger") delay=${delay}s" >> "$log"
      kill -9 "$pid"
      sleep 30
      echo "# executors 30s after kill: $(pgrep -fc CoarseGrainedExecutorBackend || echo 0)" >> "$log"
    else
      echo "# KILL FAILED: no executor process found at $(date -u +%FT%TZ)" >> "$log"
    fi
  ) &
}

case "$LEG" in
  killone)
    # VERDICT item 1a: SIGKILL one executor JVM mid-way through a heavy
    # shuffle query at the 100x corpus and finish hash-green — the
    # reference's "1 worker failure" row (README.md:291, T2 48.2 s)
    # re-expressed on Spark: lost shuffle output -> FetchFailed -> stage
    # resubmission; lost task -> retry under spark.task.maxFailures=4.
    # Three heavy queries run in sequence; the kill lands 10 s into the
    # first, so the remaining two ALSO prove post-kill cluster health.
    require_corpus /tmp/sf10
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    QS="basket_rules,bootstrap_ci,q9_profit"
    # unique per run: a stale watcher from a previous attempt must never
    # see this run's trigger path
    OUT="/tmp/vout_killone_$$"
    rm -rf "$OUT" /tmp/kill1_log
    # 12 GB executors (the sf10 corpus; the sf0.1 legs keep r11's 8 GB).
    # excludeOnFailure: after one task failure on an executor, retries
    # go ELSEWHERE — without it, replicated-block locality keeps
    # steering every retry back onto the half-dead executor during the
    # lost-detection window and burns maxFailures there (observed in the
    # contaminated first rehearsal). This is the standard cluster
    # posture, not a test crutch.
    KCONF="spark.task.maxFailures=4"
    KCONF="$KCONF;spark.excludeOnFailure.enabled=true"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerExecutor=1"
    # the worker [n,cores,mem] capacity is NOT the executor heap —
    # without this, executors silently run at the 1 GB default (the
    # discovery that ended four sf10 gate attempts; receipts before
    # r12's executor-memory fix were taken at 1 GB and still passed)
    KCONF="$KCONF;spark.executor.memory=11g"
    echo "# executor-kill rehearsal (single heavy query, /tmp/sf10):" \
      "master=local-cluster[4,8,12288] conf=$KCONF" > /tmp/kill1_log
    # trigger on bootstrap_ci (runs first, ~60 s of explicit-count
    # repartition + 960M md5 draws): +10 s lands mid-stage; the two
    # heavy queries after the kill then also prove post-kill health
    arm_executor_kill "$OUT/bootstrap_ci" 10 /tmp/kill1_log "$OUT"
    # 256 shuffle partitions: per-task/block state must scale with the
    # 100x corpus (the basket OOM diagnosis, Ckpt.sharded scaladoc)
    SPARK_GRAFT_MASTER="local-cluster[4,8,12288]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="$KCONF" \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g $R graft.Verify \
      /tmp/sf10 "$OUT" "$QS" > /tmp/killone_driver.log 2>&1 || true
    { grep -E "\[verify\]" /tmp/killone_driver.log || true; } | tail -8
    wait # the watcher must have fired and logged before we assemble
    grep -q "# KILL pid=" /tmp/kill1_log
    cat /tmp/kill1_log > CORRECTNESS_killone.txt.partial
    python3 scripts/check_oracle.py /tmp/sf10 "$OUT" \
      >> CORRECTNESS_killone.txt.partial
    tail -5 CORRECTNESS_killone.txt.partial
    grep -q " 0 failed" CORRECTNESS_killone.txt.partial
    mv CORRECTNESS_killone.txt.partial CORRECTNESS_killone.txt
    ;;
  killfull)
    # VERDICT item 1b: the same kill against the full 44-query cluster
    # subset at sf0.1 — the watcher fires when HALF the query dirs
    # exist, so the kill lands mid-catalog with completed, in-flight,
    # and unstarted queries all present. Every query must still
    # hash-match DuckDB.
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    QS="theilsen_trend,dedup_edit_pairs,graph_kcore,bloom_prune,dedup_containment"
    QS="$QS,dedup_blocking_eval,bpe_encode_stats,graph_markov_stationary,embed_pca_power"
    QS="$QS,text_gram_overlap,markov_entropy_rate,basket_pairs,dedup_incremental_admit"
    QS="$QS,graph_reach_hops,basket_rules,decontam_ngrams,split_leakage_audit,embed_mmr"
    QS="$QS,ab_uplift_bootstrap,bootstrap_ci"
    QS="$QS,cms_join_size,dedup_minhash_pairs,embed_ann_ivf,embed_ann_ivfpq,embed_ann_lsh"
    QS="$QS,embed_knn,embed_knn_pq,embed_knn_quantized,embed_knn_rerank,embed_knn_rp"
    QS="$QS,events_purchase_click_join,join_anti,join_full_outer,join_null_safe,join_semi"
    QS="$QS,range_join_tiers,sessionize_bucketed,skew_salted_agg,skew_salted_join"
    QS="$QS,mr_wc,mr_wc_plugin,q5_region_revenue,q9_profit,dedup_admit_chain"
    OUT="/tmp/vout_killfull_$$"
    rm -rf "$OUT" /tmp/killf_log /tmp/killf_trigger_$$
    KCONF="spark.task.maxFailures=4"
    KCONF="$KCONF;spark.excludeOnFailure.enabled=true"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerExecutor=1"
    KCONF="$KCONF;spark.executor.memory=7g"
    echo "# executor-kill rehearsal (44-query cluster subset, sf0.1):" \
      "master=local-cluster[4,8,8192] conf=$KCONF" > /tmp/killf_log
    # trigger = the 22nd query dir appearing (mid-catalog); bounded so a
    # dead driver can't park the leg's `wait` forever
    (
      n=0
      while [ "$(ls -1d "$OUT"/*/ 2>/dev/null | wc -l)" -lt 22 ]; do
        sleep 2; n=$((n + 1)); [ "$n" -ge 1800 ] && exit 0
      done
      touch /tmp/killf_trigger_$$
    ) &
    arm_executor_kill /tmp/killf_trigger_$$ 2 /tmp/killf_log "$OUT"
    SPARK_GRAFT_MASTER="local-cluster[4,8,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="$KCONF" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g $R graft.Verify \
      /root/testdata/sf0.1 "$OUT" "$QS" > /tmp/killfull_driver.log 2>&1 || true
    { grep -E "\[verify\]" /tmp/killfull_driver.log || true; } | tail -8
    wait
    grep -q "# KILL pid=" /tmp/killf_log
    cat /tmp/killf_log > CORRECTNESS_kill.txt.partial
    python3 scripts/check_oracle.py /root/testdata/sf0.1 "$OUT" \
      >> CORRECTNESS_kill.txt.partial
    tail -5 CORRECTNESS_kill.txt.partial
    grep -q " 0 failed" CORRECTNESS_kill.txt.partial
    mv CORRECTNESS_kill.txt.partial CORRECTNESS_kill.txt
    ;;
  sf10gate)
    # VERDICT item 6: the two r11 queries were oracled at sf0.01,
    # cluster, and sf10skew but never on the UNIFORM 100x corpus —
    # close the symmetry with the r10 catalog.
    require_corpus /tmp/sf10
    OUT=/tmp/vout_sf10_r12
    rm -rf "$OUT"
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g $R graft.Verify \
      /tmp/sf10 "$OUT" "dedup_admit_chain,gopher_repetition_rules" 2>&1 \
      | { grep -E "\[verify\]" || true; } | tail -4
    python3 scripts/check_oracle.py /tmp/sf10 "$OUT" \
      > CORRECTNESS_sf10_r12.txt.partial
    tail -4 CORRECTNESS_sf10_r12.txt.partial
    grep -q " 0 failed" CORRECTNESS_sf10_r12.txt.partial
    mv CORRECTNESS_sf10_r12.txt.partial CORRECTNESS_sf10_r12.txt
    ;;
  streamadd12)
    # VERDICT items 2+3: add the round's new stream legs (checkpoint
    # restart at 100x, disordered arrival at 100x) to the committed
    # uniform-corpus artifact. Finished legs are reused from fragments;
    # the expected final count is DERIVED (legs already in the artifact
    # + requested legs) — the registry count is wrong for THIS artifact
    # once a leg lives in its own artifact (doc_admit_kill →
    # STREAM_kill.json), the r11 streamadd lesson re-applied.
    require_corpus /tmp/sf10
    ART=STREAM_sf10.json
    NEW="doc_admit_restart,session_close_v2_restart,doc_admit_disorder"
    WANT=$(python3 - "$ART" "$NEW" <<'PYEOF'
import json, sys
have = {k for k, v in json.load(open(sys.argv[1])).items() if isinstance(v, dict)}
new = {s.strip() for s in sys.argv[2].split(",") if s.strip()}
print(len(have | new))
PYEOF
)
    python3 - "$ART" <<'PYEOF'
import json, sys
art = sys.argv[1]
d = json.load(open(art))
for k, v in d.items():
    if isinstance(v, dict):
        frag = '"%s":%s' % (k, json.dumps(v, separators=(",", ":")))
        open(f"{art}.partial.leg_{k}", "w").write(frag)
PYEOF
    SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g $R graft.streaming.StreamScale \
      /tmp/sf10 "$ART.partial" 60 "$NEW" \
      > /tmp/streamscale_r12.log 2>&1 || {
        echo "STREAMSCALE FAILED — tail of /tmp/streamscale_r12.log:" >&2
        tail -40 /tmp/streamscale_r12.log >&2
        exit 1
      }
    grep STREAMSCALE /tmp/streamscale_r12.log || true
    python3 - "$ART.partial" "$WANT" <<'PYEOF'
import json, sys
d = json.load(open(sys.argv[1]))
n = len([k for k in d if k not in ("sf", "chunks")])
want = int(sys.argv[2])
assert want > 0 and n == want, (n, want, sorted(d))
PYEOF
    mv "$ART.partial" "$ART"
    rm -f "$ART".partial.leg_*
    ;;
  benchlocal)
    # VERDICT item 5: refresh the idle flagship to the full current
    # catalog (the committed one predates gopher_repetition_rules).
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_BENCH_OUT=BENCH_local.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_local.json.partial BENCH_local.json
    ;;
  clusterbench)
    # VERDICT item 4 receipt: after retiring theilsen_trend's
    # single-task global window, the multi-process full-catalog bench
    # should show spilledBytes 0 (theilsen was the only spiller).
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    SPARK_GRAFT_MASTER="local-cluster[4,8,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="spark.executor.memory=7g" \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_BENCH_OUT=BENCH_clusterfull.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_clusterfull.json.partial BENCH_clusterfull.json
    ;;
  sf10cluster)
    # Stretch receipt: the FULL catalog hash-checked at the 100x corpus
    # ACROSS 4 executor processes — the r11 clusterfull gate (sf0.01)
    # and the r10/r11 sf10 gates (single-JVM) composed. Optional 2nd
    # arg: comma-separated query subset (the failure-re-run path).
    # Optional 3rd arg: corpus dir (default /tmp/sf10; pass
    # /tmp/sf10skew for the skewed composition cell — artifact name
    # follows the corpus). Fatter, narrower executors than the sf0.1
    # legs: Verify's coalesce(1) result stages funnel whole sf10
    # results through ONE task, so per-task memory (exec mem / cores)
    # is the binding constraint, not core count.
    CORPUS="${3:-/tmp/sf10}"
    require_corpus "$CORPUS"
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    TAG="$(basename "$CORPUS")cluster"
    OUT="/tmp/vout_$TAG"
    SUBSET="${2:-}"
    # excludeOnFailure: the kill-leg posture — a dying executor must not
    # absorb all 4 retries. storageFraction 0.2: a 278-query session
    # accumulates every query's replicated checkpoint blocks until the
    # ContextCleaner catches up; the default 0.5 PROTECTS half the pool
    # for them, starving hash-join builds — MEMORY_AND_DISK blocks
    # belong on disk under execution pressure, so shrink the protected
    # share (correctness unaffected; this is the long-session posture).
    KCONF="spark.excludeOnFailure.enabled=true"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerExecutor=1"
    # local-cluster runs all 4 executors on ONE node, so node-level
    # exclusion (default: 2 failed executors exclude the node) would
    # exclude the whole "cluster" — lift it; executor-level exclusion
    # above still steers retries off a sick executor (attempt-3 lesson;
    # the build-OOM class that tripped it is now size-conditioned to
    # SMJ in code, Skew.shjIfFits)
    KCONF="$KCONF;spark.excludeOnFailure.stage.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.excludeOnFailure.application.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.memory.storageFraction=0.2"
    # REAL executor heap (the attempt-5 discovery): spark.executor.memory
    # defaults to 1 GB regardless of the worker capacity in the master
    # string — attempts 1-5 all ran 1 GB executors, which is what every
    # "session decay" death actually was
    KCONF="$KCONF;spark.executor.memory=18g"
    # finished queries' checkpoint blocks are only unpersisted when the
    # DRIVER GCs (ContextCleaner weak refs); the 30-min default periodic
    # GC let ~tens of GB of dead replicated blocks pile onto executors
    # across the 278-query session (23 executor OOM deaths in the first
    # attempt). 30 s keeps the live set = the running query's frames.
    KCONF="$KCONF;spark.cleaner.periodicGC.interval=30s"
    SPARK_GRAFT_MASTER="local-cluster[4,6,20480]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="$KCONF" \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g $R graft.Verify \
      "$CORPUS" "$OUT" $SUBSET > "/tmp/${TAG}_driver.log" 2>&1 || true
    { grep -E "\[verify\]" "/tmp/${TAG}_driver.log" || true; } | tail -8
    # "|| true": check_oracle.py exits 1 on ANY fail; under set -e that
    # would abort the leg BEFORE the disk-starvation re-check below ever
    # runs (r12 ADVICE) — the final gate is the explicit grep at the end.
    CHECK_ORACLE_PROCS=4 CHECK_ORACLE_UNORDERED=1 \
      CHECK_ORACLE_MEM=24GB CHECK_ORACLE_THREADS=8 \
      python3 scripts/check_oracle.py "$CORPUS" "$OUT" \
      > "CORRECTNESS_$TAG.txt.partial" || true
    tail -4 "CORRECTNESS_$TAG.txt.partial"
    # The catalog's 4 heaviest DuckDB oracles (the PQ distance tables
    # and two pair pipelines) spill 20-50 GB EACH at a 24 GB budget;
    # when the pool schedules them concurrently their spill peaks stack
    # past /tmp and fail with "No space left" — an ORACLE-side infra
    # collision, not a mismatch. Re-check any disk-starved failures
    # SOLO at a RAM-sized budget and splice the verdicts (the re-check
    # reads the SAME Spark output dirs; provenance annotated in-place).
    if grep -qE "^FAIL .*(No space left|duckspill)" "CORRECTNESS_$TAG.txt.partial"; then
      RQ=$(grep -E "^FAIL .*(No space left|duckspill)" "CORRECTNESS_$TAG.txt.partial" \
        | sed 's/^FAIL  //;s/:.*//' | paste -sd,)
      echo "# re-checking disk-starved oracles solo: $RQ"
      RD=/tmp/vout_recheck_$TAG
      rm -rf "$RD"; mkdir -p "$RD"
      for q in ${RQ//,/ }; do ln -s "$OUT/$q" "$RD/$q"; done
      # Prune the oracle map to ONLY the re-checked queries: a full copy
      # makes every other catalog query report "no spark output" and the
      # solo pass exit 1 even when all re-checks pass (r12 ADVICE).
      python3 -c "
import json, sys
full = json.load(open('$OUT/oracle_sql.json'))
keep = set('$RQ'.split(','))
json.dump({k: v for k, v in full.items() if k in keep},
          open('$RD/oracle_sql.json', 'w'))"
      CHECK_ORACLE_PROCS=1 CHECK_ORACLE_UNORDERED=1 \
        CHECK_ORACLE_MEM=90GB CHECK_ORACLE_THREADS=16 \
        python3 scripts/check_oracle.py "$CORPUS" "$RD" \
        > "/tmp/recheck_$TAG.txt" || true
      python3 - "CORRECTNESS_$TAG.txt.partial" "/tmp/recheck_$TAG.txt" <<'PYEOF'
import sys, re
main_f, re_f = sys.argv[1], sys.argv[2]
rechecked = {}
for l in open(re_f):
    if l.startswith("ok    "):
        rechecked[l.split()[1]] = l.rstrip("\n")
out, fixed = [], []
ok = fail = 0
for l in open(main_f).read().splitlines():
    m = re.match(r"FAIL  (\S+?):.*(No space left|duckspill)", l)
    if m and m.group(1) in rechecked:
        out.append(rechecked[m.group(1)] + "  # re-checked solo after spill-peak collision")
        fixed.append(m.group(1))
    elif re.match(r"\d+ ok, \d+ failed", l.strip()):
        continue  # recomputed below
    else:
        out.append(l)
for l in out:
    if l.startswith("ok    "): ok += 1
    elif l.startswith("FAIL"): fail += 1
out.append("")
out.append(f"{ok} ok, {fail} failed")
open(main_f, "w").write("\n".join(out) + "\n")
print(f"spliced {len(fixed)} re-checked verdicts: {','.join(fixed)}")
PYEOF
      rm -rf "$RD"
    fi
    grep -q " 0 failed" "CORRECTNESS_$TAG.txt.partial"
    mv "CORRECTNESS_$TAG.txt.partial" "CORRECTNESS_$TAG.txt"
    ;;
  streamkill)
    # Executor kill during a LIVE stateful stream at the 100x corpus —
    # the receipt the batch kill legs leave open: RocksDB state + timers
    # must reload from the checkpoint onto a SURVIVING executor
    # mid-query, and the finished sink must still equal the oracled
    # batch twin. The kill happens IN the leg (ProcessHandle SIGKILL,
    # pid + UTC + chunk progress recorded in the fragment); the leg
    # refuses to run single-JVM, so this artifact can never be a
    # kill-free rerun.
    require_corpus /tmp/sf10
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    ART=STREAM_kill.json
    rm -f "$ART.partial" "$ART.partial".leg_*
    KCONF="spark.task.maxFailures=4"
    KCONF="$KCONF;spark.excludeOnFailure.enabled=true"
    KCONF="$KCONF;spark.excludeOnFailure.task.maxTaskAttemptsPerExecutor=1"
    # single-node local-cluster: node-level exclusion would exclude the
    # whole "cluster" after the kill's failure burst — lift it (the
    # sf10cluster posture)
    KCONF="$KCONF;spark.excludeOnFailure.stage.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.excludeOnFailure.application.maxFailedExecutorsPerNode=100"
    KCONF="$KCONF;spark.executor.memory=7g"
    SPARK_GRAFT_MASTER="local-cluster[4,4,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="$KCONF" \
      SPARK_DRIVER_MEM=16g $R graft.streaming.StreamScale \
      /tmp/sf10 "$ART.partial" 60 doc_admit_kill \
      > /tmp/streamkill.log 2>&1 || {
        echo "STREAMKILL FAILED — tail of /tmp/streamkill.log:" >&2
        tail -40 /tmp/streamkill.log >&2
        exit 1
      }
    grep STREAMSCALE /tmp/streamkill.log || true
    python3 - "$ART.partial" <<'PYEOF'
import json, sys
d = json.load(open(sys.argv[1]))
leg = d["doc_admit_kill"]
assert leg["mismatch_rows"] == 0 and leg["batch_match"], leg
assert leg["kill_pid"] > 0 and leg["kill_utc"], leg
PYEOF
    mv "$ART.partial" "$ART"
    rm -f "$ART.partial".leg_*
    ;;
  driverkill)
    # Reference "Coordinator crash" row (README.md:292, T3 51.2 s via
    # the mr-state.json checkpoint): the DRIVER process is SIGKILLed
    # mid-catalog and a RESTARTED driver resumes from the filesystem
    # manifest — parquet's _SUCCESS markers are the completed-task
    # bitmap (committed LAST via rename, so a query killed mid-write
    # has no marker and re-runs whole: at-least-once per query,
    # exactly-once per committed dir). The assembled catalog must
    # hash-match DuckDB whole, and the restart must actually have
    # SKIPPED the pre-kill committed queries (logged per query).
    OUT=/tmp/vout_driverkill
    LOGD=/tmp/driverkill_log
    rm -rf "$OUT" "$LOGD"
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g $R graft.Verify \
      /root/testdata/sf0.1 "$OUT" > /tmp/driverkill_run1.log 2>&1 &
    VPID=$!
    # kill at ~half the catalog: completed, in-flight (mid-write), and
    # unstarted queries all present at the moment of death
    n=0
    while [ "$(ls -1d "$OUT"/*/ 2>/dev/null | wc -l)" -lt 139 ]; do
      sleep 2; n=$((n + 1))
      [ "$n" -ge 900 ] && { echo "FATAL: half-catalog never reached" >&2; exit 1; }
      kill -0 "$VPID" 2>/dev/null || { echo "FATAL: driver died early" >&2; exit 1; }
    done
    DIRS=$(ls -1d "$OUT"/*/ | wc -l)
    COMMITTED=$(find "$OUT" -name _SUCCESS | wc -l)
    echo "# DRIVER KILL pid=$VPID at $(date -u +%FT%TZ)" \
      "query_dirs=$DIRS committed=$COMMITTED (catalog 278)" > "$LOGD"
    kill -9 "$VPID" || true
    wait "$VPID" 2>/dev/null || true
    SPARK_GRAFT_RESUME=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      $R graft.Verify /root/testdata/sf0.1 "$OUT" \
      > /tmp/driverkill_run2.log 2>&1
    SKIPPED=$(grep -c "already committed" /tmp/driverkill_run2.log || true)
    echo "# RESUME at $(date -u +%FT%TZ): skipped=$SKIPPED already-committed" \
      "queries, re-ran the remainder (incl. any uncommitted mid-write dir)" >> "$LOGD"
    cat "$LOGD" > CORRECTNESS_driverkill.txt.partial
    python3 scripts/check_oracle.py /root/testdata/sf0.1 "$OUT" \
      >> CORRECTNESS_driverkill.txt.partial
    tail -4 CORRECTNESS_driverkill.txt.partial
    grep -q " 0 failed" CORRECTNESS_driverkill.txt.partial
    [ "$SKIPPED" -ge 1 ]
    mv CORRECTNESS_driverkill.txt.partial CORRECTNESS_driverkill.txt
    ;;
  straggler)
    # Reference README.md:290 "2 straggler nodes: T1 78.5 / T2 52.3 s"
    # (speculation quantile 0.8) EXECUTED on Spark: one of 2 worker
    # NODES stalls 8 s per task in wc's 48-task counting stage (the
    # victim's one wave must hold <20% of the tasks or the 0.8-quantile
    # success gate opens too late for copies to win). The
    # topology is a REAL standalone master + two worker JVMs bound to
    # DISTINCT loopback hostnames (127.0.0.1 / 127.0.0.2): speculative
    # copies are HOST-excluded (TaskSetManager.dequeueSpeculativeTask
    # requires !hasAttemptOnHost — verified in the 4.1.2 bytecode), so
    # a single-host local-cluster marks stragglers speculatable and
    # then never launches one copy (the r12 dead-end, kept in the
    # scaladoc). Two hosts on one box is also the faithful shape of the
    # reference's 2-straggler-NODES row. The two arms run as separate
    # driver JVMs (spark.speculation is a SparkConf switch, not a
    # runtime conf); quantile 0.8 is the reference's own threshold.
    # PASS = the speculation arm is measurably faster, the scheduler
    # ran >=1 WINNING speculative copy (listener-counted, not
    # conf-asserted), the no-speculation arm ran zero, and both arms
    # equal the clean run's word counts.
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    [ -d "$CLS_SNAP" ] || {
      mkdir -p "$CLS_SNAP"
      cp -r target/scala-2.13/classes/. "$CLS_SNAP/"
    }
    MURL=spark://127.0.0.1:7901
    WORKD=/tmp/straggler_daemons
    rm -rf "$WORKD"; mkdir -p "$WORKD"
    pkill -f "deploy.master.Master --host 127.0.0.1 --port 7901" || true
    pkill -f "deploy.worker.Worker.*straggler_daemons" || true
    sleep 1
    java -cp "/opt/spark/jars/*" -Xmx1g \
      org.apache.spark.deploy.master.Master --host 127.0.0.1 --port 7901 \
      --webui-port 8091 > "$WORKD/master.log" 2>&1 &
    DAEMONS="$!"
    for i in 1 2; do
      SPARK_LOCAL_HOSTNAME="127.0.0.$i" \
        java -cp "/opt/spark/jars/*" -Xmx1g \
        org.apache.spark.deploy.worker.Worker --host "127.0.0.$i" \
        --port "$((7901 + i))" --webui-port "$((8091 + i))" \
        --cores 8 --memory 6g --work-dir "$WORKD/w$i" "$MURL" \
        > "$WORKD/worker$i.log" 2>&1 &
      DAEMONS="$DAEMONS $!"
    done
    trap 'kill $DAEMONS 2>/dev/null || true' EXIT
    n=0
    until [ "$(grep -c "Registering worker" "$WORKD/master.log" || true)" -ge 2 ]; do
      sleep 1; n=$((n + 1))
      [ "$n" -ge 60 ] && { echo "FATAL: workers never registered" >&2; exit 1; }
    done
    ACONF="spark.executor.memory=3g;spark.executor.cores=8;spark.cores.max=16"
    SCONF="spark.speculation=true;spark.speculation.quantile=0.8"
    SCONF="$SCONF;spark.speculation.multiplier=1.5"
    SCONF="$SCONF;spark.speculation.interval=100ms"
    for arm in off on; do
      if [ "$arm" = off ]; then ARM_CONF="spark.speculation=false;$ACONF"
      else ARM_CONF="$SCONF;$ACONF"; fi
      SPARK_GRAFT_MASTER="$MURL" SPARK_GRAFT_EXPECT_EXECUTORS=2 \
        SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
        SPARK_GRAFT_EXTRA_CONF="$ARM_CONF" \
        SPARK_DRIVER_MEM=4g $R graft.StragglerRehearsal \
        /root/testdata/sf0.1 "/tmp/straggler_$arm.json" \
        > "/tmp/straggler_$arm.log" 2>&1 || {
          echo "STRAGGLER $arm arm FAILED — tail of /tmp/straggler_$arm.log:" >&2
          tail -25 "/tmp/straggler_$arm.log" >&2
          exit 1
        }
      grep STRAGGLER "/tmp/straggler_$arm.log" || true
    done
    kill $DAEMONS 2>/dev/null || true
    trap - EXIT
    python3 - <<'PYEOF'
import json
off = json.load(open('/tmp/straggler_off.json'))
on = json.load(open('/tmp/straggler_on.json'))
assert off['result_match'] and on['result_match'], (off, on)
assert on['hosts'] >= 2 and off['hosts'] >= 2, (off, on)
assert on['speculative_won'] >= 1, on
assert off['speculative_launched'] == 0, off
assert on['wall_sec'] < off['wall_sec'], (on['wall_sec'], off['wall_sec'])
json.dump({'workload': 'wc over documents(sf0.1), 48-task counting stage, '
                       '1 of 2 distinct-hostname worker JVMs stalls '
                       'sleep_ms per task',
           'reference_row': 'README.md:290 T1 78.5 s vs T2 52.3 s, quantile 0.8',
           'no_speculation': off, 'speculation': on,
           'speedup': round(off['wall_sec'] / on['wall_sec'], 2)},
          open('BENCH_straggler.json.partial', 'w'), indent=1)
PYEOF
    mv BENCH_straggler.json.partial BENCH_straggler.json
    cat BENCH_straggler.json
    ;;
  decommission)
    # Graceful drain with shuffle-block MIGRATION — the planned-loss
    # twin of the kill receipts (spot/preemption at 100 TB): SIGPWR one
    # executor while idle (two jobs over one shuffle: job A computes a
    # single reduce partition to materialize the map outputs), wait
    # until the scheduler REMOVES it, and only then run the full reduce
    # as job B — every job-B task launches post-removal with fresh map
    # statuses. Success at stage attempt 0 with zero FetchFailed is only
    # possible if the dead executor's map outputs were migrated to
    # survivors, not recomputed. (A barrier file inside the reduce tasks
    # CANNOT gate the fetch — dead end #1 in the rehearsal's scaladoc.)
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    SPARK_GRAFT_MASTER="local-cluster[3,8,6144]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="spark.executor.memory=4g" \
      SPARK_DRIVER_MEM=6g $R graft.DecommissionRehearsal \
      /root/testdata/sf0.1 BENCH_decommission.json.partial \
      > /tmp/decommission.log 2>&1 || {
        echo "DECOMMISSION FAILED — tail of /tmp/decommission.log:" >&2
        tail -30 /tmp/decommission.log >&2
        exit 1
      }
    grep DECOMMISSION /tmp/decommission.log || true
    # the scheduler's own acknowledgment (no SparkListener event carries
    # it): the StandaloneDriverEndpoint must have RECEIVED the executor's
    # decommission notice, or the removal was just a plain kill
    grep -q "decommissioned message" /tmp/decommission.log
    python3 - <<'PYEOF'
import json
d = json.load(open('BENCH_decommission.json.partial'))
assert d['result_match'] and d['max_stage_attempt'] == 0, d
assert d['fetch_failed'] == 0 and d['failed_tasks'] == 0, d
assert d['shuffle_writers'] >= d['executors_before'], d
PYEOF
    mv BENCH_decommission.json.partial BENCH_decommission.json
    # Mode 2 — fallback storage: the WHOLE fleet is drained at once (no
    # live peer), blocks land in shared fallback storage, the master
    # relaunches fresh executors, and the reduce reads the fallback with
    # zero recompute — scale-down/scale-up, full fleet replacement.
    rm -rf /tmp/graft_fallback_*
    SPARK_GRAFT_MASTER="local-cluster[3,8,6144]" \
      SPARK_GRAFT_DECOMM_MODE=fallback \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="spark.executor.memory=4g" \
      SPARK_DRIVER_MEM=6g $R graft.DecommissionRehearsal \
      /root/testdata/sf0.1 BENCH_decommission_fallback.json.partial \
      > /tmp/decommission_fb.log 2>&1 || {
        echo "DECOMMISSION-FALLBACK FAILED — tail:" >&2
        tail -30 /tmp/decommission_fb.log >&2
        exit 1
      }
    grep DECOMMISSION /tmp/decommission_fb.log || true
    grep -q "decommissioned message" /tmp/decommission_fb.log
    python3 - <<'PYEOF'
import json
d = json.load(open('BENCH_decommission_fallback.json.partial'))
assert d['mode'] == 'fallback' and d['result_match'], d
assert d['max_stage_attempt'] == 0 and d['fetch_failed'] == 0, d
assert d['failed_tasks'] == 0 and d['fallback_files'] > 0, d
assert len(d['removed_ids']) >= len(d['victim_pids']) >= 2, d
PYEOF
    mv BENCH_decommission_fallback.json.partial BENCH_decommission_fallback.json
    rm -rf /tmp/graft_fallback_*
    ;;
  counts)
    scripts/r10_counts.sh
    ;;
  *)
    echo "unknown leg: $LEG" >&2
    exit 1
    ;;
esac
echo "LEG $LEG OK"
