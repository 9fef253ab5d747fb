package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-dimensional data layout: Z-order (Morton) clustering keys.
  *
  * THE 100 TB lever this file exists for: parquet prunes row groups by
  * min/max stats, but a table sorted on one column only prunes
  * predicates on THAT column. Interleaving the bits of two key columns
  * into one sort key clusters rows so that a range predicate on EITHER
  * dimension maps to a bounded set of Z-ranges — both predicates prune,
  * from one physical order (Morton '66; the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`). LayoutSpec proves the effect:
  * the same selective predicate scans a fraction of the row groups of a
  * Z-clustered file vs one sorted by the other dimension.
  *
  * The key is PURE integer bit arithmetic (shift/and/add), exact and
  * engine-independent — the DuckDB oracle replays it term for term —
  * and codegen-friendly: 32 fused scalar terms, no UDF.
  *
  * Reference basis: the reference has no layout tier at all (its inputs
  * are whole text files, mr/worker.go:57-64); this is part of the
  * source-layer surface a warehouse-scale engine adds (SURVEY §2.3 file
  * formats).
  */
object Layout {

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd
    * positions) into a 32-bit Morton key. Inputs must be pre-normalized
    * to [0, 2^16); the caller owns range reduction (cast/offset), the
    * same contract as any Z-order implementation.
    */
  def zInterleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Days since the orders fixture epoch — the date dimension of the
    * (customer, time) Z-key, small enough for 16 bits.
    */
  private val OrdersEpoch = "1995-01-01"

  /** Z-key per order over (o_custkey, order day): the clustering key a
    * 100 TB orders table would be OPTIMIZE'd on so both per-customer
    * and per-date-range scans prune. Emitted per row (o_orderkey, zval)
    * so the oracle replays every interleave exactly.
    */
  def zorderOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // range reduction the zInterleave16 contract demands: keys wrap at
    // 2^16 (a documented aliasing trade at larger key ranges — a
    // production table would bucket or bit-widen instead of wrap; the
    // mask keeps the key total and the oracle exact at ANY sf/epoch,
    // where an unmasked cast would silently alias only ABOVE 2^16)
    Tables.orders(spark, d)
      .select($"o_orderkey",
        zInterleave16(
          $"o_custkey".cast("long").bitwiseAND(lit(65535L)),
          datediff(to_date($"o_orderdate"), lit(OrdersEpoch)).cast("long")
            .bitwiseAND(lit(65535L)))
          .as("zval"))
  }

  /** Hilbert-curve clustering key — the layout tier's locality upgrade
    * over [[zInterleave16]]: Z-order's bit interleave takes diagonal
    * jumps at power-of-two boundaries (consecutive keys can be far
    * apart in space, so a spatial range splits into more key ranges);
    * the Hilbert curve's consecutive keys are ALWAYS grid neighbors
    * (unit Manhattan step — proven exhaustively over the full 256×256
    * grid in LayoutSpec), which is why Iceberg/Delta offer it above
    * Z-order for multi-dimensional clustering.
    *
    * The classic xy→d walk (8 iterations for 8-bit coordinates) is a
    * loop with a quadrant rotation per level; both engines run the SAME
    * unrolled step chain, generated from one template below. The
    * rotation's XOR collapses to pure integer CASE arithmetic
    * ((3·rx)^ry = ry when rx=0 else 3−ry, for bits), so every step is
    * exact BIGINT and codegen-friendly — no UDF, no floating point.
    */
  private val HilbertSteps = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)

  /** One unrolled step: (x, y, d) → next, at side length s. `cols` are
    * the carried passenger columns. Shared verbatim by the Spark
    * selectExpr chain and the DuckDB nested-select chain.
    */
  private def hilbertStepExprs(s: Long): (Seq[String], Seq[String]) = (
    Seq(
      s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx",
      s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry"),
    Seq(
      // rotation flips against the FULL grid (255 = n−1, not s−1): the
      // coordinates then stay in [0, 255] at every level — no negative
      // intermediates, so no reliance on cross-engine negative-bitwise
      // parity (both variants verified bijective; this one is safer)
      s"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 255 - y ELSE y END ELSE x END AS x",
      s"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 255 - x ELSE x END ELSE y END AS y",
      s"d + ${s * s} * (CASE WHEN rx = 0 THEN ry ELSE 3 - ry END) AS d"))

  /** Apply the unrolled Hilbert walk to a frame with BIGINT `x`, `y` in
    * [0, 256) and passenger columns `keep`; yields `keep` + `d`.
    */
  def hilbertD(df: DataFrame, keep: Seq[String]): DataFrame =
    HilbertSteps.foldLeft(
      df.selectExpr((keep ++ Seq("x", "y", "CAST(0 AS BIGINT) AS d")): _*)) {
      (acc, s) =>
        val (bits, next) = hilbertStepExprs(s)
        acc.selectExpr((keep ++ Seq("x", "y", "d") ++ bits): _*)
          .selectExpr((keep ++ next): _*)
    }

  /** Hilbert key per order over the same (customer, day) dimensions as
    * [[zorderOrders]] (8 bits each — the demo grid; production widens
    * the walk, same template).
    */
  def hilbertOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    hilbertD(
      Tables.orders(spark, d).select(
        $"o_orderkey",
        $"o_custkey".cast("long").bitwiseAND(lit(255L)).as("x"),
        datediff(to_date($"o_orderdate"), lit(OrdersEpoch)).cast("long")
          .bitwiseAND(lit(255L)).as("y")),
      Seq("o_orderkey"))
      .selectExpr("o_orderkey", "d AS hval")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_orders" -> (zorderOrders _),
    "hilbert_orders" -> (hilbertOrders _))

  /** The DuckDB twin generates the same 32 interleave terms. */
  private val zTermsSql: String =
    (0 until 16).map { i =>
      s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** The DuckDB twin walks the IDENTICAL unrolled steps as nested
    * selects — same template, same arithmetic, per level.
    */
  private def hilbertOracleSql: String = {
    val base =
      s"""SELECT o_orderkey,
         |  o_custkey & 255 AS x,
         |  datediff('day', DATE '$OrdersEpoch', CAST(o_orderdate AS DATE)) & 255 AS y,
         |  CAST(0 AS BIGINT) AS d
         |FROM orders""".stripMargin
    val walked = HilbertSteps.foldLeft(base) { (acc, s) =>
      val (bits, next) = hilbertStepExprs(s)
      s"""SELECT o_orderkey, ${next.mkString(", ")}
         |FROM (SELECT o_orderkey, x, y, d, ${bits.mkString(", ")}
         |      FROM ($acc))""".stripMargin
    }
    s"SELECT o_orderkey, CAST(d AS BIGINT) AS hval FROM ($walked)"
  }

  val oracles: Map[String, String] = Map(
    "zorder_orders" ->
      s"""SELECT o_orderkey, $zTermsSql AS zval
         |FROM (
         |  SELECT o_orderkey, o_custkey & 65535 AS a,
         |         datediff('day', DATE '$OrdersEpoch', CAST(o_orderdate AS DATE)) & 65535 AS b
         |  FROM orders) t""".stripMargin,
    "hilbert_orders" -> hilbertOracleSql)
}
