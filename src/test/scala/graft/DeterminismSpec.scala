package graft

/** Partition-count invariance gate for the determinism-SENSITIVE query
  * family — the operators whose scaladocs claim "deterministic under
  * any partitioning / rerun / engine" (hash-order sampling, splits,
  * greedy folds, sketch pipelines, rounded-then-ranked similarity).
  * Each claim is enforced here, not just stated: the same query runs
  * under different `spark.sql.shuffle.partitions` (changing physical
  * task boundaries, aggregation trees, and row arrival orders) and must
  * produce the IDENTICAL row multiset.
  *
  * This is the property that makes results reproducible across cluster
  * sizes at 100 TB — a query whose output depends on partitioning
  * cannot be cached, resumed, or audited. (The DuckDB oracle gate
  * proves cross-ENGINE agreement; this proves cross-TOPOLOGY.)
  */
class DeterminismSpec extends SparkSpec {

  /** The sensitive family: sampling, splits, serial folds, sketches,
    * pair mining with tie-broken ranks, fitted-constant queries.
    */
  private val sensitive = Seq(
    "weighted_sample",
    "stratified_topn",
    "train_split",
    "pack_sequences",
    "text_fingerprint",
    "dedup_minhash_pairs",
    "dedup_span_extents",
    "dedup_prefix_jaccard",
    "dedup_incremental_admit",
    "embed_triplets",
    "embed_xlabel_mutual",
    "ewma_user_value",
    "kv_cas_replay",
    // r6: driver-collected eval-matrix fit (sort+limit) inside MaxCosine
    "decontam_embed",
    // r6: capped-basket slice must not depend on partitioning
    "basket_pairs")

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"cast(`$c` as string)"): _*)
      .collect()
      // non-printable separator: without one, (12, 3) and (1, 23) would
      // serialize identically and a real divergence could false-pass
      .map(_.mkString("\u0001"))
      .sorted
      .toSeq
  }

  test("sensitive queries are invariant to shuffle partition count") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      sensitive.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val base = rows(name)
        spark.conf.set("spark.sql.shuffle.partitions", "11")
        val alt = rows(name)
        assert(base == alt,
          s"$name: output differs between 4 and 11 shuffle partitions " +
            s"(first diff: ${base.zip(alt).find(p => p._1 != p._2)
              .orElse(Some((s"sizes ${base.size}", s"${alt.size}")))})")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
