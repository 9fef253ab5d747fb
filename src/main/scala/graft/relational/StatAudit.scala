package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical data-QA audits — the distribution-level checks a
  * pipeline runs above row-level validation ([[RelQueries]]
  * `data_quality_audit`): Benford first-digit conformance for numeric
  * fraud/corruption screening, and a chi-square-style contingency
  * audit for categorical drift between dimensions.
  *
  * Both are one partial+final aggregate over a narrow scan; expected
  * distributions enter as COMPILE-TIME integer literals (per-mille),
  * so no transcendental function ever runs in either engine — the
  * catalog's exact-integer discipline (a log10 at query time would tie
  * correctness to two engines' libm rounding).
  *
  * Reference basis: none; SURVEY §2.3 aggregation/QA surface.
  */
object StatAudit {

  /** Benford per-mille expectation for first digit d: round(log10(1 +
    * 1/d) · 1000) — precomputed once here, embedded in both engines.
    */
  private val BenfordPermille: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.round(math.log10(1.0 + 1.0 / d) * 1000.0))

  /** First-digit distribution of order totals vs Benford's law.
    * o_totalprice is a sum of uniform-ish parts — it deviates, and the
    * audit's point is to MEASURE the deviation exactly: per digit,
    * observed count, observed per-mille, expected per-mille, absolute
    * gap. One aggregate; the 9-row result is the whole driver payload.
    */
  def benfordAudit(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val expected = BenfordPermille.map { case (dig, pm) =>
      (lit(dig.toLong), lit(pm))
    }
    val expectedCol = expected.tail.foldLeft(
      when($"digit" === expected.head._1, expected.head._2)) {
      case (acc, (dig, pm)) => acc.when($"digit" === dig, pm)
    }
    Tables.orders(spark, d)
      // first digit via string head of the integer cents — exact, no
      // float log; cents >= 100 always (totalprice >= $1)
      .select(expr(
        "CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum($"n").over())
      .select(
        $"digit", $"n",
        expr("(n * 1000) div total").as("obs_permille"),
        expectedCol.as("exp_permille"))
      .withColumn("gap_permille",
        abs($"obs_permille" - $"exp_permille"))
  }

  /** Contingency audit over (source, lang) in documents: observed cell
    * counts vs independence expectation row·col/N in exact e3 fixed
    * point, with the per-cell absolute deviation — the drift table a
    * monitoring job thresholds on. Both margins are bounded dims
    * (≤ sources × langs cells at any corpus size), so everything after
    * the first aggregate is driver-scale.
    */
  def chisqSourceLang(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.documents(spark, d)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
    val W = org.apache.spark.sql.expressions.Window
    cells
      .withColumn("row_n", sum($"n").over(W.partitionBy($"source")))
      .withColumn("col_n", sum($"n").over(W.partitionBy($"lang")))
      .withColumn("total", sum($"n").over())
      .select(
        $"source", $"lang", $"n",
        expr("(row_n * col_n * 1000) div total").as("exp_e3"),
        abs(expr("n * 1000 - (row_n * col_n * 1000) div total"))
          .as("dev_e3"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "benford_audit" -> (benfordAudit _),
    "chisq_source_lang" -> (chisqSourceLang _))

  private val benfordCaseSql = BenfordPermille.map {
    case (dig, pm) => s"WHEN digit = $dig THEN $pm"
  }.mkString("CASE ", " ", " END")

  val oracles: Map[String, String] = Map(
    "benford_audit" ->
      s"""WITH digits AS (
         |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM orders),
         |counts AS (
         |  SELECT digit, count(*) AS n FROM digits GROUP BY digit),
         |t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM counts)
         |SELECT digit, n,
         |  CAST((n * 1000) // total AS BIGINT) AS obs_permille,
         |  CAST($benfordCaseSql AS BIGINT) AS exp_permille,
         |  CAST(abs((n * 1000) // total - ($benfordCaseSql)) AS BIGINT)
         |    AS gap_permille
         |FROM t""".stripMargin,
    "chisq_source_lang" ->
      """WITH cells AS (
        |  SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY source, lang),
        |m AS (
        |  SELECT source, lang, n,
        |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS row_n,
        |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS col_n,
        |    CAST(sum(n) OVER () AS BIGINT) AS total
        |  FROM cells)
        |SELECT source, lang, n,
        |  CAST((row_n * col_n * 1000) // total AS BIGINT) AS exp_e3,
        |  CAST(abs(n * 1000 - (row_n * col_n * 1000) // total) AS BIGINT)
        |    AS dev_e3
        |FROM m""".stripMargin)
}
