package graft

/** Catalog-wide physical-plan regression gate — SURVEY §8's audit as an
  * enforced invariant, not prose. For EVERY query in the catalog:
  *
  *   - hash-exchange count stays within a per-query budget (default 2;
  *     the documented multi-stage pipelines carry explicit, justified
  *     exceptions). A regression that adds an un-reused shuffle fails
  *     here before it ships.
  *   - no nested-loop join appears unless the query is on the explicit
  *     broadcast-constant/one-row-side whitelist.
  *   - no query plans a global sort (top-k must compile to
  *     TakeOrderedAndProject; ordered output without limit is not a
  *     catalog shape).
  *
  * Exchange counts are structural (independent of sf), so sf0.001 plans
  * stand in for any scale.
  */
class PlanBudgetSpec extends SparkSpec {

  /** Queries allowed MORE than the default 2 exchanges, with why. */
  private val exchangeBudget: Map[String, Int] = Map(
    // SSJoin prefix filter: the tok-only bucket-size count agg (narrow —
    // no arrays ride it) added so oversized buckets are anti-joined out
    // BEFORE the heavy collect (the sf10 multi-process OOM fix), plus
    // the prefix-token collect agg and the post-verify distinct
    "dedup_prefix_jaccard" -> 3,
    // the PAV minimax unrolled over the checkpointed <=10-row bin
    // table: segment agg + per-(i,j) min agg + per-i max agg — all
    // three exchanges carry <=10^2-row bounded payloads, never data
    "classifier_isotonic" -> 3,
    // pair mining: distinct items -> orderkey join -> pair agg
    "basket_pairs" -> 3,
    // basket build + per-item count agg + pair agg — all three consume
    // the ONE checkpointed capped-basket frame
    "basket_rules" -> 3,
    // (type, hour) cells agg (data-scale) + the two marginal aggs and
    // their joins — every post-cells payload is the bounded
    // |types|x24 contingency table
    "event_mi_hour" -> 5,
    // (type, cent) freq agg (data-scale) + global cent-grid agg +
    // per-group rank-sum agg — frequency-table algebra, the
    // anomaly_mad shape
    "kruskal_wallis_value" -> 3,
    // the jaccardPairs backbone (per-doc block window + bucket join)
    // + the 7-plan agg; pair stream is bucket-capped, plans broadcast
    "lsh_band_plan" -> 3,
    // tagged gram explode -> (doc,sz,gram) count -> per-doc arg-max/sum
    // -> doc_id join back to the in-row line stats; gram traffic is
    // volume-linear (minhash-shingle shape), the join is doc-keyed
    "gopher_repetition_rules" -> 3,
    // fingerprint-group agg + the Decontam gram window + two split
    // DISTINCTs + the 8-byte-key leak join — no string ever shuffles
    "split_leakage_audit" -> 5,
    // per-user (min, min-purchase) agg + duration freq agg + the
    // day-bounded KM window
    "survival_km_retention" -> 3,
    // simhash chunk-bucket group + pair distinct + the doc_id-keyed
    // prefix join-back; the pair side is candidate-sized (bucket-capped),
    // AQE broadcasts it at runtime
    "dedup_edit_pairs" -> 3,
    // distinct (doc, gram) + per-doc size window + gram-bucket group +
    // pair agg; payloads are gram streams then bucket-capped pairs —
    // the minhash/simhash four-stage shape, never a raw self-join
    "dedup_containment" -> 4,
    // user-keyed next-purchase window + (user, purchase)-keyed path
    // window + the 5-row channel agg; both window payloads are
    // volume-linear touch rows, never pairs
    "attribution_multitouch" -> 3,
    // one user-keyed window exchange (both funnel windows share it) +
    // the (user, click-time) join + the per-user depth agg; payloads
    // are volume-linear event rows
    "funnel_window_depth" -> 3,
    // (type, cent) frequency agg off the single raw scan, then pure
    // frequency-table algebra: median window, deviation re-agg, its
    // window, final fold — every post-scan payload is domain-bounded
    // (<= ~49k cells/type at ANY corpus size), never raw rows
    "anomaly_mad" -> 5,
    // daily agg (data-scale) + the calendar-bounded band join's 8-group
    // agg + final fold; post-scan payloads are <= days x 8 rows
    "ts_ccf" -> 3,
    // daily agg (data-scale) + the 1-row array fold + horizon explode;
    // post-scan payloads are calendar-bounded
    "ts_holt_forecast" -> 3,
    // user-keyed lead window + per-user aggregate (shared exchange)
    "twap_user_value" -> 3,
    // user-keyed as-of window + delay-grid agg + the bounded
    // single-partition order-statistic window + final fold
    "conversion_delay_quantiles" -> 4,
    // (user, type) lag window + per-type seconds-grid agg + the
    // type-partitioned order-statistic windows + per-type fold
    "events_arrival_profile" -> 4,
    // per-doc gram windows (one doc_id exchange) + the (doc, gram)
    // distinct + gram-keyed owner agg + join-back per-doc fold —
    // gram payloads are volume-linear, never pairs
    "text_novelty_rate" -> 5,
    // the novelty gram backbone + the gram-keyed source pair join
    // (fan-out <= #sources per gram) + pair agg + totals broadcast
    "source_gram_containment" -> 5,
    // sequentially-chained fixed peel: 3 k-levels x 4 rounds of
    // (degree agg + two semi-joins) on the SHRINKING checkpointed
    // adjacency + the final coreness joins — structural, not
    // data-scale; every payload is the surviving edge list
    "graph_kcore" -> 60,
    // daily agg + 16 k-row iteration aggs + the type-union distinct:
    // every post-scan exchange moves <= k (event-type count) rows, the
    // pagerank bounded-iteration shape — structural, not data-scale
    "graph_markov_stationary" -> 34,
    // the stationary pipeline's 16 k-row iteration aggs + the per-state
    // entropy agg and its k-row join — bounded-iteration structural
    "markov_entropy_rate" -> 38,
    // per-user conversion-flag agg (map-side combined) + 2-row arm agg
    // + final 1-row fold
    "ab_conversion_ztest" -> 3,
    // unit agg + point fold + the kernel-parallelism repartition of
    // the narrow pre-explode units + the B-row resample agg + the
    // bounded 64-row rank window + final cross of 1-row frames (the
    // bootstrap_ci shape over two arms)
    "ab_uplift_bootstrap" -> 7,
    // (mon, day, bucket) register agg + its two bounded re-aggregates
    // + the independent direct-sketch distinct/agg + day-count and
    // exact-distinct companions + month joins — register payloads
    // bounded, distincts key-domain-bounded
    "hll_rollup_merge" -> 12,
    // cent-grid frequency agg + the bounded CDF window + the
    // broadcast join-back onto one scan
    "quantile_transform_values" -> 3,
    // one source-keyed aggregate broadcast back onto the scan
    "target_encode_loo" -> 2,
    // orders agg + the kernel-parallelism repartition of the narrow
    // pre-explode rows + 64-row resample agg + the rank window's
    // single partition (64 rows) + final fold
    "bootstrap_ci" -> 5,
    // (source, token) distinct + the token-keyed self-join + pair agg;
    // every payload is vocabulary-bounded (types, not occurrences)
    "source_vocab_overlap" -> 3,
    // daily agg (data-scale) + (level, block) coefficient agg + per-level
    // energy agg + the 8-row rank window; post-scan payloads are
    // calendar-bounded x 8 levels
    "ts_wavelet_spectrum" -> 4,
    // gram window on doc_id -> bench/train distinct -> per-doc counts
    "decontam_ngrams" -> 4,
    // (part,supp) cost agg -> partkey window -> top-100
    "q2_min_cost_supplier" -> 3,
    // (part,supp) qty agg -> partkey window -> distinct suppliers
    "q20_dominant_supplier" -> 3,
    // obs grid agg -> segment lead window -> union branches
    "ts_interpolate" -> 3,
    // token freq agg -> token join -> per-doc mean
    "text_unigram_logprob" -> 3,
    // unigram agg + bigram agg + corpus-total agg + the occurrence
    // stream's (w1,w2) shuffle into the frequency join -> per-doc mean;
    // every exchange payload is token-frequency-keyed (vocab-bounded)
    // except the occurrence stream, which shuffles ids+hashes once
    "text_bigram_logprob" -> 5,
    // gram window on doc_id -> gram-df agg -> per-doc share
    "text_gram_overlap" -> 3,
    // (source, tok) agg + vocab-keyed token-total agg + the tok-keyed
    // re-exchange into the frequency join + source-total agg + final
    // per-source fold; every payload is vocabulary-keyed counts (the
    // text_bigram_logprob shape)
    "source_kl_divergence" -> 5,
    // identical backbone to source_kl_divergence (the JSD twin)
    "source_js_divergence" -> 5,
    // bounded contingency agg off one corpus scan + three re-aggregates
    // of the checkpointed ≤(sources × langs)-cell grid — every
    // post-scan exchange is grid-bounded, corpus-size-independent
    "mi_source_lang" -> 4,
    // (score → ±count) frequency agg + the bounded single-partition
    // cumulative window + final 1-row fold; the frequency table is
    // feature-lattice-bounded at any corpus size
    "classifier_roc_auc" -> 3,
    // cent-grid frequency agg + the bounded single-partition CDF
    // window + final 1-row fold (the anomaly_mad frequency discipline)
    "ks_value_drift" -> 3,
    // same freq backbone as ks_value_drift: grid agg + bounded
    // midrank window + final fold
    "mannwhitney_value_drift" -> 3,
    // (type, cent) grid agg + the type-partitioned cumulative windows
    // + final per-type fold — all post-scan payloads grid-bounded
    "robust_trimmed_mean" -> 3,
    // token-frequency agg + the bounded freq-of-freq agg + 1-row fold
    "vocab_chao1" -> 3,
    // monthly-size agg + 1-row cap fold + the in-row FFD fold +
    // explode/join-back + the bounded per-bin load window
    "compaction_plan" -> 7,
    // per-customer agg + value-grid agg + the bounded descending-CDF
    // window + the broadcast class join-back
    "abc_classification" -> 5,
    // (doc, frame) energy agg + the doc-keyed window pass (lag and
    // the per-doc delta stats share the exchange)
    "multimodal_keyframes" -> 3,
    // price-grid agg + the bounded exclusive-cummax window + the
    // broadcast survivor join-back onto one scan
    "skyline_lineitems" -> 3,
    // (day, type) agg + day/type distincts + the zero-filled spine
    // joins + the bounded pair agg — all post-scan payloads
    // calendar x type bounded
    "event_corr_matrix" -> 8,
    // (source, token) agg + per-source fold (vocab-bounded payloads)
    "source_heaps_law" -> 2,
    // TakeOrdered k+1 head + the 1-row threshold fold + final fold
    "hill_tail_index" -> 4,
    // joint (x, y) grid agg off one corpus scan + two marginal
    // aggs with their bounded single-partition midrank windows +
    // the count-weighted final fold on the checkpointed grid
    "spearman_doc_signals" -> 7,
    // bigram lead window + unigram agg + pair agg + the w2-keyed
    // re-exchange into the second frequency join; every exchange
    // payload is vocabulary-keyed (map-side combined)
    "text_phrase_detect" -> 4,
    // doc window (boundary groups) + phrase agg join-back + word-stat
    // agg + word-score join + phrase-score agg; payloads are
    // vocab/phrase-keyed counts, the top-20 cut is TakeOrdered
    "text_keywords_rake" -> 5,
    // custkey grid -> (cohort, month) grid -> distinct actives
    "cohort_retention" -> 3,
    // custkey first-month agg + join-back + (cohort, age) grid agg +
    // the bounded cumulative window (retention shape + revenue)
    "cohort_ltv" -> 4,
    // one (half, dim) grid agg off the scan + the bounded dim join
    // fold on the checkpointed 2 x 64-cell frame
    "embed_centroid_drift" -> 4,
    // one (dim) moment aggregate off the scan; 64-row output
    "embed_dim_profile" -> 2,
    // counter-cell agg + the embedded heavy-hitter recount (distinct,
    // exact-count aggs); every exchange payload is bounded (<= 8192
    // cells / candidate-set rows), corpus-size-independent
    "cms_dataflow_estimates" -> 3,
    // register agg (bounded <= groups x 64 cells) + exact
    // count-distinct companion (two-phase) + group join
    "hll_dataflow_distinct" -> 4,
    // one (type, key) distinct off the scan + register agg; the
    // per-type/union/exact/both folds all re-aggregate the two
    // checkpointed frames (<= 128 cells / key-set) — bounded payloads
    "hll_intersection" -> 8,
    // (doc, tok) agg + the vocab-keyed moment agg + TakeOrdered head
    "token_burstiness" -> 3,
    // two constant-size sketch aggs + the bounded inner-product join,
    // plus the exact companion's two key-frequency aggs and fold and
    // the two row-count folds — every post-scan payload is
    // sketch-bounded or key-domain-bounded
    "cms_join_size" -> 12,
    // user-timeline window + k x k transition agg + the bounded
    // argmax window
    "markov_prediction_accuracy" -> 4,
    // three families x (key-frequency agg + 1-row fold + broadcast
    // hot-key locate) unioned — key-domain-bounded payloads
    "skew_report" -> 12,
    // sketch pipelines: doc -> band/chunk -> pair
    "dedup_minhash_pairs" -> 3,
    // (source, fingerprint) agg + the per-source fold
    "source_dedup_profile" -> 2,
    // composes the jaccard-truth and minhash-candidate pipelines
    // (both candidate-bounded) + the pair-keyed hit join and four
    // 1-row folds
    "dedup_blocking_eval" -> 12,
    "dedup_simhash_pairs" -> 3,
    // gram window on doc_id -> gram-hash buckets -> doc-pair diagonal
    // (island window + extent agg share the third exchange)
    "dedup_span_extents" -> 3,
    // the span miner's three + per-doc range agg; the reconstruction
    // join reuses the checkpointed tokenized frame
    "dedup_span_scrub" -> 4,
    // cluster propagation feeds the survivor anti-join
    "dedup_survivors" -> 3,
    // user timeline window -> (from, to) grid -> source share
    "event_transitions" -> 3,
    // bucketed interval join (one exchange per side on (user, bucket))
    // + the per-purchase count, whose key set no longer aligns with the
    // join partitioning once the bucket is in it
    "events_click_attribution" -> 3,
    // the (key, salt) exchange IS the operator's point
    "skew_salted_join" -> 3,
    // 3 real shuffles — (user, bucket) local window, per-user boundary
    // window over the day-summary table (rows ∝ users × active days,
    // not events), the stitch join's re-exchange of the summary side —
    // plus 1 counted ReusedExchange REFERENCE: the stitch branch reads
    // the phase-1 events exchange without re-shuffling, and the reuse
    // node's plan text repeats the "Exchange hashpartitioning" pattern
    "sessionize_bucketed" -> 4,
    // oriented two-path join + closing join
    "graph_triangles" -> 4,
    // 2 real shuffles — (source, bucket) local rank window, per-source
    // offset window over the bucket SUMMARY — plus 1 counted
    // ReusedExchange reference (the stitch join reads the phase-1
    // exchange without re-shuffling; same counting note as
    // sessionize_bucketed)
    "interleave_key" -> 3,
    // cell join (both sides) + the two mutual-rank windows, which key
    // on (vec_a, label_b) vs (vec_b, label_a) — different by definition
    "embed_xlabel_mutual" -> 4,
    // cell-keyed dominance join (both sides) -> per-vector verdict fold
    "embed_semdedup" -> 3,
    // (doc, term) tf -> term df -> per-doc rank
    "tfidf_topk" -> 4,
    // end-to-end composite: chains five audited operators
    "training_mix" -> 6,
    // eval composite: LSH leg (candidate distinct + rank window) + IVF
    // leg (rank window) + one probe-set-sized groupBy per method leg
    // (the checkpointed ground truth has no partitioning to reuse);
    // every exchange payload after the audited retrieval passes is
    // <= NumQueries x K rows
    "embed_recall_eval" -> 5,
    // end-to-end composite over the incremental pair miner: band group +
    // narrow pair distinct + signature join-backs + orientation semi
    // unions + verdict agg + per-new-doc outer join; every post-mining
    // exchange moves doc ids and integer counts only
    "dedup_incremental_admit" -> 6)

  /** Queries whose nested-loop join is against a broadcast constant or
    * one-row aggregate (SURVEY §8: the only sanctioned NLJ shape).
    */
  private val nljWhitelist: Set[String] = Set(
    "ab_cuped_adjust", // 1-row period-midpoint + 1-row pooled-stats broadcast
    "ab_diff_in_diff", // 1-row period-midpoint broadcast
    "ab_ztest_fdr", // 1-row period-midpoint broadcast
    "kruskal_wallis_value", // 1-row N/ties broadcast into the group fold
    "survival_km_retention", // 1-row corpus-horizon broadcast
    "ts_hurst_aggvar", // 6-row scale table + 1-row fit broadcast
    "event_mi_hour", // 1-row totals + 1-row entropy broadcasts
    "revenue_theil", // 1-row corpus-total broadcast
    "source_rate_shrinkage", // 1-row fitted-prior broadcast
    "split_leakage_audit", // 1-row gram-leak x 1-row exact-dup fold cross
    "basket_rules", // 1-row basket-count broadcast
    "lsh_band_plan", // 7-row banding-plan table against the pair stream
    "anomaly_zscore", // one-row global stats
    "bm25_search", // one-row corpus stats
    "embed_knn", // probe-vector constant
    "embed_rrf_fusion", // probe-vector constant (the knn shape)
    "dsir_weights", // one-row bucket-total broadcast
    "embed_mmr", // probe-vector constant (the knn shape; steps checkpoint)
    "embed_knn_quantized", // quantile-boundary constant
    "embed_knn_rerank", // probe-code constant (the quantized shape)
    "embed_knn_rp", // probe-sketch constant (the knn shape)
    "embed_knn_pq", // probe-vector constant (the knn shape)
    "embed_silhouette", // broadcast 64-row fitted-centroid table
    "embed_triplets", // probe-vector constant (the knn shape)
    "cms_dataflow_estimates", // inherits heavy_hitter's one-row threshold
    "heavy_hitter_tokens", // one-row total-count threshold
    "mixture_rates", // one-row corpus-total broadcast
    "source_kl_divergence", // one-row corpus-total broadcast
    "source_js_divergence", // one-row corpus-total broadcast (KL twin)
    "mi_source_lang", // one-row total + one-row entropy broadcasts
    "customer_rfm", // one-row boundary broadcasts (anchor + tertiles)
    "quality_calibration", // one-row score min/max broadcast
    "classifier_pr_curve", // the calibration one-row bounds broadcast
    "classifier_brier_ece", // the same calibration one-row bounds broadcast
    "classifier_isotonic", // bounded <=10-row bin-table minimax self-joins
    "mixture_sample", // inherits mixture_rates' one-row total broadcast
    "text_unigram_logprob", // one-row token-total broadcast
    "text_phrase_detect", // one-row corpus-total broadcast
    "text_bigram_logprob", // one-row token-total broadcast
    "q11_important_parts", // one-row global total
    "q22_wealthy_inactive", // one-row avg-balance scalar
    "range_join_tiers", // 3-row tier table
    "ts_autocorr", // calendar-bounded daily series band self-join + 1-row den
    "ts_ccf", // calendar-bounded daily band self-join (the acf shape)
    "ts_wavelet_spectrum", // 1-row min-day + 8-row level-table broadcasts
    "bootstrap_ci", // one-row point-estimate x one-row CI broadcast
    "ab_uplift_bootstrap", // the same 1-row point x 1-row CI cross
    "hill_tail_index", // k+1-row head x 1-row threshold broadcast
    "compaction_plan", // 1-row cap broadcast into the in-row fold
    "event_corr_matrix", // bounded type-list spine cross
    "graph_markov_stationary", // k-row vector x one-row total broadcast
    "markov_entropy_rate", // the same k-row x one-row total broadcast
    "tfidf_topk", // one-row corpus doc count
    "token_burstiness", // one-row corpus doc count
    "hll_intersection", // four 1-row sketch/exact folds cross-joined
    "cms_join_size", // four 1-row size/estimate folds cross-joined
    "dedup_blocking_eval", // four 1-row count folds cross-joined
    "skew_report") // per-family 1-row hot-key fold cross-joined

  test("decontam_embed is a ZERO-exchange narrow scan (the MaxCosine contract)") {
    // The r6 rewrite put the bounded eval matrix inside the expression;
    // any join, exchange, or aggregate reappearing here means the
    // quadratic JoinedRow formulation regressed
    val plan = pipeline.Decontam.flagEmbedContaminated(spark, sf)
      .queryExecution.executedPlan.toString
    for (op <- Seq("Exchange", "Join", "HashAggregate", "Window"))
      assert(!plan.contains(op), s"$op reappeared in decontam_embed:\n$plan")
  }

  test("training_mix reads documents ONCE: both pipeline branches consume the checkpoint") {
    val plan = pipeline.Curation.trainingMix(spark, sf)
      .queryExecution.executedPlan.toString
    // the tokenized frame is localCheckpoint'ed, so the executed plan's
    // two consumers (gate chain + near-dup pairs) must both read the
    // materialized RDD — a surviving parquet scan of documents means the
    // double-scan regressed
    assert(!plan.contains("documents.parquet"),
      s"documents scanned in the final plan (checkpoint bypassed):\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected checkpoint-backed scans; plan:\n$plan")
  }

  test("salted operators actually engage the salt: partial stage keys on (k, _salt)") {
    // the skewed-rehearsal claim rests on these paths being REAL in the
    // plan, not just present in source: the salted agg's first exchange
    // must partition on both the key and the salt (that IS the fan-out),
    // and the salted join must shuffle on a key set including _salt
    val aggPlan = relational.Skew.skewSaltedAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\([^)]*_salt".r.findFirstIn(aggPlan).isDefined,
      s"salted agg does not exchange on _salt:\n$aggPlan")
    val joinPlan = relational.Skew.skewSaltedJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(joinPlan.contains("ShuffledHashJoin"),
      s"salted join collapsed to a non-shuffle join:\n$joinPlan")
    assert("ShuffledHashJoin \\[[^\\]]*_salt".r.findFirstIn(joinPlan).isDefined,
      s"salted join keys do not include _salt:\n$joinPlan")
  }

  test("SHJ hints are size-conditional: over the cap the plan reverts to " +
    "sort-merge with identical results") {
    // the r12 adjudication: SHJ's build map cannot spill, so the hint
    // only applies while the estimated build fits spark.graft.shj
    // .maxBuildBytes; above it the same query must plan a (spillable)
    // SMJ and produce the same rows. Force the flip by setting the cap
    // to 0 — the estimate is always positive.
    def plans(): (String, String) = (
      relational.Skew.skewSaltedJoin(spark, sf)
        .queryExecution.executedPlan.toString,
      relational.Skew.sessionizeBucketed(spark, sf)
        .queryExecution.executedPlan.toString)
    val (joinFit, sessFit) = plans()
    assert(joinFit.contains("ShuffledHashJoin") &&
      sessFit.contains("ShuffledHashJoin"),
      "under the default cap at fixture scale both sites must keep SHJ")
    val fitRows = relational.Skew.skewSaltedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    spark.conf.set("spark.graft.shj.maxBuildBytes", "0")
    try {
      val (joinBig, sessBig) = plans()
      for ((p, name) <- Seq(joinBig -> "skew_salted_join",
          sessBig -> "sessionize_bucketed")) {
        assert(!p.contains("ShuffledHashJoin"),
          s"$name kept a non-spillable SHJ build over the cap:\n$p")
        // the fallback must FORCE sort-merge: merely un-hinting lets
        // Catalyst broadcast the build (its stats miss the explode
        // fan-out) — the 1 GB-per-executor UnsafeHashedRelation OOM
        // observed at the sf10 multi-process gate
        assert(!p.contains("BroadcastHashJoin"),
          s"$name broadcast an over-cap build:\n$p")
        assert(p.contains("SortMergeJoin"),
          s"$name did not fall back to sort-merge over the cap:\n$p")
      }
      // the event side of the bucketed sessionize leaves phase 1 sorted
      // by (user_id, bucket, ts, event_id), whose prefix satisfies the
      // SMJ's (user_id, bucket) requirement — so the left (event)
      // branch must carry NO sort on the join keys alone: the only Sort
      // there is the window's own 4-key one. A 2-key Sort in that
      // branch would be the planner re-sorting the data-scale stream.
      val eventBranch = sessBig.linesIterator
        .dropWhile(!_.contains("SortMergeJoin")).drop(1)
        .takeWhile(_.trim.startsWith(":")).mkString("\n")
      assert(eventBranch.contains("Window"),
        s"expected the event-side window in the SMJ left branch:\n$sessBig")
      assert("Sort \\[user_id#\\d+L [A-Z ]+, bucket#\\d+ [A-Z ]+\\]".r
        .findFirstIn(eventBranch).isEmpty,
        s"SMJ fallback re-sorts the event stream:\n$sessBig")
      val bigRows = relational.Skew.skewSaltedJoin(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(bigRows.toSeq == fitRows.toSeq,
        "join strategy flip changed the result")
    } finally spark.conf.unset("spark.graft.shj.maxBuildBytes")
  }

  test("interval-join twins key the join on (user, hour-bucket), not user alone") {
    // the sf1skew fix: a hot user's events must spread across time-keyed
    // join groups. At fixture scale the purchase side broadcasts (no
    // exchange to inspect), so assert on the equi-join KEY SET — that is
    // what becomes the shuffle partitioning when both sides are large.
    for (name <- Seq("events_purchase_click_join", "events_click_attribution")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(
        "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[[^\\]]*_pb".r
          .findFirstIn(plan).isDefined,
        s"$name joins on user alone (no bucket in the join keys):\n$plan")
    }
  }

  /** Queries whose UNPARTITIONED window is adjudicated bounded — each
    * runs a single task whose input is domain-, calendar-, or
    * k-bounded at ANY corpus size (the anomaly_mad frequency-algebra
    * class), never data-scale. theilsen_trend used to be the one
    * DATA-ADJACENT member (a 2.9M-row calendar-bounded slope table
    * through one task — the catalog's only multi-process spiller,
    * 698 MB at the r11 cluster bench); r12 moved it to
    * [[relational.FreqSelect]]'s histogram narrowing and this gate now
    * keeps unpartitioned windows from reappearing on any hot path.
    */
  private val unpartitionedWindowWhitelist: Set[String] = Set(
    "ab_uplift_bootstrap", // 64-row resample rank window
    "ab_ztest_fdr", // <=#metrics-row BH rank windows
    "abc_classification", // cent-grid descending CDF
    "benford_audit", // 9-row leading-digit grid
    "bootstrap_ci", // 64-row resample rank window
    "chisq_source_lang", // (source x lang)-cell contingency grid
    "classifier_roc_auc", // score-lattice frequency CDF
    "conversion_delay_quantiles", // delay-seconds-grid order statistics
    "kruskal_wallis_value", // cent-grid global midranks
    "ks_value_drift", // cent-grid CDF
    "mannwhitney_value_drift", // cent-grid midranks
    "quantile_transform_values", // cent-grid CDF
    "revenue_gini", // cent-value frequency grid rank algebra
    "skyline_lineitems", // price-grid exclusive cummax
    "spearman_doc_signals", // two marginal-grid midrank windows
    "survival_km_retention", // day-bounded KM product windows
    "text_ngram_topk", // row_number over the 20-row TakeOrdered head
    "ts_changepoint", // calendar-bounded daily series
    "ts_cusum", // calendar-bounded daily series
    "ts_seasonal_decompose", // calendar-bounded daily series
    "ts_wavelet_spectrum", // 8-row level-energy rank window
    "vocab_good_turing") // frequency-of-frequencies grid

  test("theilsen internals (eager — invisible to the catalog gates) keep the plan discipline") {
    // theilsenTrend executes during construction and returns a
    // LocalRelation, so the catalog-wide gates above cannot see its
    // distributed stages; gate the INTERNAL frames directly: the pair
    // join must stay a broadcast NLJ feeding ONE map-side-combined
    // frequency exchange (plus the daily aggregate's), with no window
    // and no global sort — the shape FreqSelect's narrowing then scans.
    // checkpointed, as the op runs it: both pair-join sides read the
    // materialized daily instead of re-aggregating
    val daily = relational.StatModels.theilsenDaily(spark, sf)
      .localCheckpoint(true, graft.Ckpt.ReplicatedLevel)
    for ((name, df) <- Seq(
        "slopes_freq" -> relational.StatModels.theilsenSlopesFreq(daily),
        "resid_freq" -> relational.StatModels.theilsenResidFreq(daily, BigInt(7)))) {
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(nEx <= 2, s"theilsen $name: $nEx exchanges > 2:\n$plan")
      assert(!"Sort \\[[^\\]]*\\], true".r.findAllIn(plan).hasNext,
        s"theilsen $name plans a global sort:\n$plan")
      val unpart = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(unpart.isEmpty, s"theilsen $name has an unpartitioned window")
    }
  }

  test("no unpartitioned window outside the adjudicated bounded set") {
    // counted on the LOGICAL plan: a tree (traversable under AQE), and
    // physical WindowExec inherits its partitionSpec from here. Every
    // unpartitioned window funnels its whole input through ONE task at
    // any scale — allowed only with a boundedness adjudication above.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val unpart = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (unpart.nonEmpty && !unpartitionedWindowWhitelist(name))
          Some(s"$name: ${unpart.length} unpartitioned window(s)")
        else if (unpart.isEmpty && unpartitionedWindowWhitelist(name))
          Some(s"$name: whitelisted but has no unpartitioned window (stale entry)")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("every catalog query stays within its exchange budget, NLJ whitelist, no global sort") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val budget = exchangeBudget.getOrElse(name, 2)
      val nlj = plan.contains("BroadcastNestedLoopJoin")
      val gsort = "Sort \\[[^\\]]*\\], true".r.findAllIn(plan).nonEmpty
      Seq(
        if (nEx > budget) Some(s"$name: $nEx exchanges > budget $budget") else None,
        if (nlj && !nljWhitelist(name)) Some(s"$name: unsanctioned nested-loop join") else None,
        if (gsort) Some(s"$name: global sort in plan") else None).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
