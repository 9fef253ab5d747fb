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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_orders" -> (zorderOrders _))

  /** The DuckDB twin generates the same 32 interleave terms. */
  private val zTermsSql: String =
    (0 until 16).map { i =>
      s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "zorder_orders" ->
      s"""SELECT o_orderkey, $zTermsSql AS zval
         |FROM (
         |  SELECT o_orderkey, o_custkey & 65535 AS a,
         |         datediff('day', DATE '$OrdersEpoch', CAST(o_orderdate AS DATE)) & 65535 AS b
         |  FROM orders) t""".stripMargin)
}
