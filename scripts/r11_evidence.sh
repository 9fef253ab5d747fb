#!/usr/bin/env bash
# Round-11 closure + growth evidence chain (VERDICT r10 items 1-7),
# same crash-safety discipline as r10_evidence.sh: independent legs,
# .partial + atomic rename, set -e, per-leg class snapshots.
#
# Usage: scripts/r11_evidence.sh <stream|streamskew|streamadd|benchlocal|bootrows|cluster|clusterfull|clusterbench|benchsf10|counts>
set -euo pipefail
cd /root/repo
R=scripts/java_run.sh
LEG="${1:?usage: r11_evidence.sh <stream|streamskew|streamadd|benchlocal|bootrows|cluster|clusterfull|clusterbench|benchsf10|counts>}"
export CLS_SNAP="/tmp/graft_cls_r11_$LEG"
rm -rf "$CLS_SNAP"

require_corpus() {
  [ -f "$1/_SUCCESS" ] || {
    echo "FATAL: corpus $1 has no _SUCCESS marker — run r10_evidence.sh corpora first" >&2
    exit 1
  }
}

# Split a committed stream artifact back into per-leg fragments (compact
# separators so StreamScale's provenance regexes match), so finished legs
# are reused and only legs missing from the artifact run live.
explode_fragments() { # artifact
  [ -f "$1" ] || return 0
  python3 - "$1" <<'PYEOF'
import json, sys
art = sys.argv[1]
d = json.load(open(art))
for k, v in d.items():
    if isinstance(v, dict):
        frag = '"%s":%s' % (k, json.dumps(v, separators=(",", ":")))
        open(f"{art}.partial.leg_{k}", "w").write(frag)
PYEOF
}

run_stream_leg() { # corpus artifact
  local corpus="$1" art="$2"
  require_corpus "$corpus"
  explode_fragments "$art"
  SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g $R graft.streaming.StreamScale \
    "$corpus" "$art.partial" 60 \
    > /tmp/streamscale_run.log 2>&1 || {
      echo "STREAMSCALE FAILED — tail of /tmp/streamscale_run.log:" >&2
      tail -40 /tmp/streamscale_run.log >&2
      exit 1
    }
  grep STREAMSCALE /tmp/streamscale_run.log || true
  # expected leg count from the code's own registry — never a literal
  WANT=$($R graft.streaming.StreamScaleLegCount 2>/dev/null | tail -1)
  python3 - "$art.partial" "$WANT" <<'PYEOF'
import json, sys
d = json.load(open(sys.argv[1]))
n = len([k for k in d if k not in ("sf", "chunks")])
want = int(sys.argv[2])
assert want > 0 and n == want, (n, want, sorted(d))
PYEOF
  mv "$art.partial" "$art"
  rm -f "$art".partial.leg_*
}

case "$LEG" in
  stream)
    # Full stream replay on the uniform 100× corpus, RE-RUNNABLE at any
    # catalog state: fragments are reconstructed from the committed
    # artifact when one exists (so finished legs are reused, not
    # re-run), the run is UNFILTERED (reuse-before-filter means only
    # legs missing from the artifact execute live), and the expected
    # leg count comes from the code's own registry instead of a
    # hardcoded number that goes stale when a leg is added.
    run_stream_leg /tmp/sf10 STREAM_sf10.json
    ;;
  benchlocal)
    # VERDICT item 2: flagship sf0.1 bench whose own stamp passes the
    # idle guard (r10's committed stamp read loadavg 5.11 / 2 JVMs).
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_BENCH_OUT=BENCH_local.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_local.json.partial BENCH_local.json
    ;;
  bootrows)
    # VERDICT item 3: the two bootstrap rows of the 100×-skew bench
    # were measured pre-71b927e (the explicit-count repartition fix).
    # Re-measure JUST those two on the same corpus, idle, into a
    # companion artifact — the 1485 s full-catalog run is untouched.
    require_corpus /tmp/sf10skew
    SPARK_GRAFT_SF_DIR=/tmp/sf10skew SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_QUERIES=bootstrap_ci,ab_uplift_bootstrap \
      SPARK_GRAFT_BENCH_OUT=BENCH_sf10skew_bootstrap.json.partial \
      $R graft.Bench 2>&1 | tail -1
    mv BENCH_sf10skew_bootstrap.json.partial BENCH_sf10skew_bootstrap.json
    ;;
  cluster)
    # VERDICT item 5: multi-JVM rehearsal. local-cluster[4,8,8192] = 4
    # executor PROCESSES × 8 cores — the first run in the repo's history
    # where rows, broadcasts, and custom Expressions cross process
    # boundaries (local[32] structurally cannot falsify serialization
    # or executor-side registry rebinding). Set: the 20 heaviest sf0.1
    # queries + the broadcast/salted/bucketed/range/ANN-fit families +
    # the submit-time plugin mrapp + the new admit chain. Hash-checked
    # against DuckDB (not just timed), then benched.
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
    # the binary distro has no launcher/target build dirs, and we bypass
    # spark-class (java_run.sh), so the scala version must be pinned or
    # executor launch dies with "Cannot find any build directories"
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    rm -rf /tmp/vout_cluster
    SPARK_GRAFT_MASTER="local-cluster[4,8,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="spark.executor.memory=7g" \
      SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g $R graft.Verify \
      /root/testdata/sf0.1 /tmp/vout_cluster "$QS" 2>&1 \
      | { grep -E "\[verify\]" || true; } | tail -8
    python3 scripts/check_oracle.py /root/testdata/sf0.1 /tmp/vout_cluster \
      > CORRECTNESS_cluster.txt.partial
    tail -3 CORRECTNESS_cluster.txt.partial
    grep -q " 0 failed" CORRECTNESS_cluster.txt.partial
    mv CORRECTNESS_cluster.txt.partial CORRECTNESS_cluster.txt
    SPARK_GRAFT_MASTER="local-cluster[4,8,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="spark.executor.memory=7g" \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      SPARK_GRAFT_REQUIRE_IDLE=1 SPARK_GRAFT_QUERIES="$QS" \
      SPARK_GRAFT_BENCH_OUT=BENCH_cluster.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_cluster.json.partial BENCH_cluster.json
    ;;
  streamskew)
    # Streaming under skew at 100×: the full replay on the hot-key
    # corpus (one user owning 20% of 10M events, one token on half the
    # docs). The question uniform replay cannot answer: does hot-key
    # state stay horizon-bounded, and what does the hot user do to
    # per-batch wall (the straggler signal lives in batch_ms)?
    run_stream_leg /tmp/sf10skew STREAM_sf10skew.json
    ;;
  streamadd)
    # Add newly-registered legs to an EXISTING committed stream artifact
    # without re-running the finished ones: re-emit per-leg fragments
    # from the assembled JSON (compact separators so the provenance
    # regexes still match), run StreamScale filtered to the new legs
    # (fragment reuse assembles the rest), then clean up.
    #   $2 = corpus dir   $3 = artifact   $4 = comma-separated new legs
    # Expected final count is DERIVED (legs already in the artifact +
    # requested legs not yet in it) — the caller-supplied literal was
    # the stale-count pattern the r11 review flagged.
    CORPUS="${2:?corpus}"; ART="${3:?artifact}"; NEW="${4:?legs}"
    WANT=$(python3 - "$ART" "$NEW" <<'PYEOF'
import json, sys
have = {k for k, v in json.load(open(sys.argv[1])).items() if isinstance(v, dict)}
new = {s.strip() for s in sys.argv[2].split(",") if s.strip()}
print(len(have | new))
PYEOF
)
    require_corpus "$CORPUS"
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
      "$CORPUS" "$ART.partial" 60 "$NEW" \
      > /tmp/streamscale_add.log 2>&1 || {
        echo "STREAMSCALE FAILED — tail of /tmp/streamscale_add.log:" >&2
        tail -40 /tmp/streamscale_add.log >&2
        exit 1
      }
    grep STREAMSCALE /tmp/streamscale_add.log || true
    python3 -c "import json,sys; d=json.load(open('$ART.partial')); \
      n=len([k for k in d if k not in ('sf','chunks')]); \
      assert n == $WANT, (n, sorted(d))"
    mv "$ART.partial" "$ART"
    rm -f "$ART".partial.leg_*
    ;;
  clusterfull)
    # The complete multi-process correctness gate: EVERY catalog query
    # dumped from 4 real executor JVMs at sf0.01 and hash-compared to
    # DuckDB — the multi-JVM twin of the driver's own gate.
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    if [ ! -f /tmp/vout_clusterfull/oracle_sql.json ]; then
      rm -rf /tmp/vout_clusterfull
      SPARK_GRAFT_MASTER="local-cluster[4,8,8192]" \
        SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
        SPARK_GRAFT_EXTRA_CONF="spark.executor.memory=7g" \
        SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g $R graft.Verify \
        /root/testdata/sf0.01 /tmp/vout_clusterfull 2>&1 \
        | { grep -E "\[verify\]" || true; } | tail -8
    else
      echo "cluster verify dump already present — validating completeness"
    fi
    # oracle_sql.json is written even when individual query dumps threw
    # (Verify swallows per-query exceptions), so its presence alone is
    # NOT a completion marker: a resumed run would skip the dump and
    # fail the gate identically forever. Validate every oracled query
    # has output; on a partial dump, drop the marker so the next run
    # re-dumps instead of wedging.
    python3 - <<'PYEOF' || { rm -f /tmp/vout_clusterfull/oracle_sql.json; exit 1; }
import glob, json, sys
oracle = json.load(open("/tmp/vout_clusterfull/oracle_sql.json"))
missing = [q for q in oracle
           if not glob.glob(f"/tmp/vout_clusterfull/{q}/*.parquet")]
if missing:
    print("partial cluster dump — missing:", missing, file=sys.stderr)
    sys.exit(1)
PYEOF
    CHECK_ORACLE_PROCS=4 CHECK_ORACLE_UNORDERED=1 \
      python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/vout_clusterfull \
      > CORRECTNESS_clusterfull.txt.partial
    tail -3 CORRECTNESS_clusterfull.txt.partial
    grep -q " 0 failed" CORRECTNESS_clusterfull.txt.partial
    mv CORRECTNESS_clusterfull.txt.partial CORRECTNESS_clusterfull.txt
    ;;
  clusterbench)
    # Full-catalog multi-process bench: every query timed on 4 executor
    # JVMs at sf0.1 — the complete single- vs multi-process ratio map
    # (the 44-query subset bench sampled it; this closes it).
    export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
    SPARK_GRAFT_MASTER="local-cluster[4,8,8192]" \
      SPARK_GRAFT_EXECUTOR_CP="$CLS_SNAP" \
      SPARK_GRAFT_EXTRA_CONF="spark.executor.memory=7g" \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_BENCH_OUT=BENCH_clusterfull.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_clusterfull.json.partial BENCH_clusterfull.json
    ;;
  benchsf10)
    # Fresh uniform-100× full-catalog completion receipt at the current
    # catalog size (BENCH_sf10.json predates 117 of the queries).
    require_corpus /tmp/sf10
    SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_REQUIRE_IDLE=1 \
      SPARK_GRAFT_BENCH_OUT=BENCH_sf10_r11.json.partial $R graft.Bench 2>&1 | tail -1
    mv BENCH_sf10_r11.json.partial BENCH_sf10_r11.json
    ;;
  counts)
    # VERDICT item 7: the counts regeneration is part of every round
    # close from now on, not a manual step.
    scripts/r10_counts.sh
    ;;
  *)
    echo "unknown leg: $LEG" >&2
    exit 1
    ;;
esac
echo "LEG $LEG OK"
