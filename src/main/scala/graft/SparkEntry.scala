package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query catalogs. Every key in [[queries]]
  * with an entry in [[oracleSql]] is hash-compared against DuckDB on the
  * same parquet tables at sf0.01; keys without an oracle get a weaker
  * rows-only check (reserved for ops DuckDB cannot express, e.g.
  * xxhash64-based MinHash).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count through the generic MapReduce core — the reference's
    * signature workload (mrapps/wc.go) running scan → flatMap → shuffle →
    * sorted streaming reduce, end to end.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("source", "text").as[(String, String)]
    graft.mr.MapReduce
      .run(spark, docs, apps.MrApps.wcMap, apps.MrApps.wcReduce, 8)
      .toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    apps.MrApps.queries ++ relational.RelQueries.queries ++
      relational.RelExtras.queries ++ relational.Analytics.queries ++
      relational.TpchMore.queries ++ relational.TimeSeries.queries ++
      relational.Graph.queries ++ relational.Layout.queries ++
      kv.KVStore.queries ++ gossip.HealthMerge.queries ++
      text.TextAnalysis.queries ++ text.TextExtras.queries ++
      text.Bpe.queries ++ text.Phrases.queries ++
      text.Dedup.queries ++ text.DedupCluster.queries ++
      text.Retrieval.queries ++ text.HeavyHitters.queries ++
      sim.Similarity.queries ++ sim.Fusion.queries ++ sim.Eval.queries ++
      sim.Pca.queries ++
      multimodal.Multimodal.queries ++
      streaming.EventStreams.queries ++ streaming.Drift.queries ++
      streaming.DocStreams.queries ++
      relational.Skew.queries ++ relational.Quantiles.queries ++
      relational.Reconcile.queries ++ relational.BloomPrune.queries ++
      relational.MaterializedView.queries ++ pipeline.Curriculum.queries ++
      relational.StatAudit.queries ++ relational.StatModels.queries ++
      pipeline.Curation.queries ++ pipeline.Packing.queries ++
      pipeline.Decontam.queries ++ pipeline.Classifier.queries ++
      pipeline.Privacy.queries ++ pipeline.Dsir.queries ++
      relational.Experiment.queries ++ relational.TsExtras.queries ++
      relational.Hits.queries ++ relational.BasketRules.queries ++
      relational.Dependence.queries ++ pipeline.QualityRules.queries ++
      pipeline.SplitAudit.queries ++ text.LshPlan.queries ++
      relational.StatExtras.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    apps.MrApps.oracles ++ relational.RelQueries.oracles ++
      relational.RelExtras.oracles ++ relational.Analytics.oracles ++
      relational.TpchMore.oracles ++ relational.TimeSeries.oracles ++
      relational.Graph.oracles ++ relational.Layout.oracles ++
      kv.KVStore.oracles ++ gossip.HealthMerge.oracles ++
      text.TextAnalysis.oracles ++ text.TextExtras.oracles ++
      text.Bpe.oracles ++ text.Phrases.oracles ++
      text.Dedup.oracles ++ text.DedupCluster.oracles ++
      text.Retrieval.oracles ++ text.HeavyHitters.oracles ++
      sim.Similarity.oracles ++ sim.Fusion.oracles ++ sim.Eval.oracles ++
      sim.Pca.oracles ++
      multimodal.Multimodal.oracles ++
      streaming.EventStreams.oracles ++ streaming.Drift.oracles ++
      streaming.DocStreams.oracles ++
      relational.Skew.oracles ++ relational.Quantiles.oracles ++
      relational.Reconcile.oracles ++ relational.BloomPrune.oracles ++
      relational.MaterializedView.oracles ++ pipeline.Curriculum.oracles ++
      relational.StatAudit.oracles ++ relational.StatModels.oracles ++
      pipeline.Curation.oracles ++ pipeline.Packing.oracles ++
      pipeline.Decontam.oracles ++ pipeline.Classifier.oracles ++
      pipeline.Privacy.oracles ++ pipeline.Dsir.oracles ++
      relational.Experiment.oracles ++ relational.TsExtras.oracles ++
      relational.Hits.oracles ++ relational.BasketRules.oracles ++
      relational.Dependence.oracles ++ pipeline.QualityRules.oracles ++
      pipeline.SplitAudit.oracles ++ text.LshPlan.oracles ++
      relational.StatExtras.oracles
}
