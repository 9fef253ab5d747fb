package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextAnalysis

/** Composite pipelines — the operators composed the way a real
  * training-data curation job chains them, plus relational shapes that
  * need an extra engine feature (range join, correlated subquery via the
  * SQL entry point).
  */
object Curation {

  /** Broadcast range join: every event binned into a value tier by an
    * inequality join against a tiny tier table. The tier side is
    * broadcast, so the "join" is a per-row codegen'd predicate scan —
    * the right plan for dimension ranges at any scale.
    */
  def rangeJoinTiers(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      (0.0, 50.0, "low"),
      (50.0, 150.0, "mid"),
      (150.0, 1e9, "high")).toDF("lo", "hi", "tier")
    Tables.events(spark, d)
      .join(broadcast(tiers), $"value" >= $"lo" && $"value" < $"hi")
      .groupBy($"tier")
      .agg(
        count(lit(1)).as("n"),
        graft.relational.RelQueries.exactSum($"value", 100L).as("sum_value"))
  }

  /** Correlated scalar subquery through the engine's SQL surface
    * (spark.sql): orders above their customer's average price. The
    * average uses the exact cent-grid sum so the comparison is
    * engine-independent.
    */
  def sqlOrdersAboveAvg(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_v o
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(round(i.o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100/count(*)
        |  FROM orders_v i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
  }

  /** End-to-end corpus curation: language filter → length filter →
    * exact dedup (keep lowest doc_id per normalized text) → per-doc
    * quality stats. All narrow except the single dedup shuffle.
    */
  def corpusCuration(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val withStats = Tables.documents(spark, d)
      .withColumn("t", TextAnalysis.toks($"text"))
      .withColumn("n_tokens", size($"t").cast("long"))
      .withColumn("stop_hits",
        size(filter($"t", x => x === "the" || x === "a")).cast("long"))
      .withColumn("norm", TextAnalysis.normText($"text"))
      .filter($"n_tokens" >= 30)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"norm").orderBy($"doc_id")
    withStats
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"doc_id",
        $"n_tokens",
        ($"stop_hits".cast("double") / $"n_tokens").as("stop_ratio"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_join_tiers" -> (rangeJoinTiers _),
    "sql_orders_above_avg" -> (sqlOrdersAboveAvg _),
    "corpus_curation" -> (corpusCuration _))

  val oracles: Map[String, String] = Map(
    "range_join_tiers" ->
      """SELECT tier, count(*) AS n,
        |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_value
        |FROM events
        |JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'), (150.0, 1e9, 'high'))
        |  t(lo, hi, tier)
        |  ON value >= lo AND value < hi
        |GROUP BY tier""".stripMargin,
    "sql_orders_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(round(i.o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100/count(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,
    "corpus_curation" ->
      """SELECT doc_id, n_tokens,
        |  CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio
        |FROM (
        |  SELECT doc_id, n_tokens, stop_hits,
        |    row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
        |  FROM (
        |    SELECT doc_id,
        |      len(t) AS n_tokens,
        |      len(list_filter(t, x -> x = 'the' OR x = 'a')) AS stop_hits,
        |      regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |    FROM (SELECT doc_id, text,
        |            list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |          FROM documents) d
        |    ) s WHERE n_tokens >= 30) r
        |WHERE rn = 1""".stripMargin)
}
