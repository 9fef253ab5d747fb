package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew handling: two-phase salted aggregation. A hot key that would pin
  * one reducer is split across `salts` sub-keys for the partial
  * aggregate, then merged — the hand-rolled form of AQE's skew
  * mitigation, exposed as a reusable operator because at 100 TB a single
  * hot key (the empty document, the null user) otherwise stalls a stage.
  * The salt is derived from a value hash, so the plan stays
  * deterministic.
  */
object Skew {

  /** @param salt a PER-ROW deterministic expression (e.g. a hash of a
    *             unique id column). Salting by the value itself would
    *             collapse when the hot key carries a constant value —
    *             the exact case skew mitigation exists for. Deterministic
    *             (not rand()) so stage retries after fetch failures
    *             cannot re-route rows between partial groups.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      value: Column,
      salt: Column,
      salts: Int): DataFrame = {
    df.select(
        key.as("k"),
        value.as("cents"),
        pmod(salt, lit(salts)).as("_salt"))
      .groupBy(col("k"), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum(col("cents")).as("psum"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("cents_sum"))
  }

  /** Salted fact-dim JOIN — the join-side counterpart of [[saltedAgg]]
    * for when the dim is too big to broadcast and one fact key is hot:
    * the fact side salts each row into one of `salts` sub-keys; the dim
    * side replicates each row to ALL `salts` sub-keys (an explode, cost
    * = |dim| × salts); the equi-join then runs on (key, salt), spreading
    * the hot key's rows over `salts` reducers. Result identical to the
    * unsalted join — salting changes the plan, never the output. With
    * AQE's skew-join splitting this is rarely hand-written anymore; it
    * remains the portable fallback when AQE cannot split (e.g. a
    * bucketed or already-colocated layout it must preserve).
    */
  def saltedJoin(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      salt: Column,
      salts: Int): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(salt, lit(salts)))
    val replicated = dim.withColumn(
      "_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
      factKey === dimKey && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Demo over events with a deliberately hot key (70% of rows): the
    * salted plan's first aggregate fans the hot key over 16 sub-keys.
    * Output equals a plain GROUP BY (the oracle), which is the point —
    * salting changes the plan, never the result.
    */
  def skewSaltedAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val skewed = Tables.events(spark, d).select(
      when($"event_id" % 10 < 7, lit("hot"))
        .otherwise($"user_id".cast("string")).as("skey"),
      RelQueries.gridScale($"value", 100L).as("cents"),
      xxhash64($"event_id").as("row_salt"))
    saltedAgg(skewed, $"skey", $"cents", $"row_salt", salts = 16)
      .select($"k".as("skey"), $"n",
        ($"cents_sum".cast("double") / 100).as("sum_value"))
  }

  /** Salted-join demo: orders with 70% of rows re-keyed to one hot
    * customer, joined to the full customer table (NOT broadcast — the
    * scenario salting exists for), aggregated per market segment. The
    * dim side is forced into a shuffle join via hints so the salted
    * (key, salt) distribution actually drives the exchange.
    */
  def skewSaltedJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val fact = Tables.orders(spark, d).select(
      when($"o_orderkey" % 10 < 7, lit(1L)).otherwise($"o_custkey").as("ck"),
      RelQueries.gridScale($"o_totalprice", 100L).as("cents"),
      xxhash64($"o_orderkey").as("rsalt"))
    val dim = Tables.customer(spark, d)
      .hint("shuffle_hash")
      .select($"c_custkey", $"c_mktsegment")
    saltedJoin(fact, $"ck", dim, $"c_custkey", $"rsalt", salts = 16)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        (sum($"cents").cast("double") / 100).as("sum_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> (skewSaltedAgg _),
    "skew_salted_join" -> (skewSaltedJoin _))

  val oracles: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT CASE WHEN event_id % 10 < 7 THEN 'hot'
        |            ELSE CAST(user_id AS VARCHAR) END AS skey,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_price
        |FROM orders JOIN customer
        |  ON c_custkey = CASE WHEN o_orderkey % 10 < 7 THEN 1 ELSE o_custkey END
        |GROUP BY 1""".stripMargin)
}
