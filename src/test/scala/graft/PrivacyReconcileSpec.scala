package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Privacy
import graft.relational.Reconcile

/** Privacy audit + snapshot reconciliation invariants. */
class PrivacyReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("kanonymity_audit: every emitted group violates; every violating group is emitted") {
    val audit = Privacy.kanonymityAudit(spark, sf).collect()
    assert(audit.forall { r =>
      r.getAs[Long]("k_violation") == 1L || r.getAs[Long]("l_violation") == 1L
    })
    // recompute group sizes independently and cross-check completeness
    val groups = Tables.customer(spark, sf)
      .select($"c_nationkey", $"c_mktsegment",
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT) div 100000").as("b"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
      .groupBy($"c_nationkey", $"c_mktsegment", $"b")
      .agg(count(lit(1)).as("k"), countDistinct($"cents").as("l"))
      .collect()
    val violating = groups.count(r => r.getAs[Long]("k") < 5L || r.getAs[Long]("l") < 2L)
    assert(audit.length == violating, s"audit ${audit.length} vs recount $violating")
  }

  test("kanonymity_suppress: released rows are k-anonymous; suppressed rows have null band") {
    val out = Privacy.kanonymitySuppress(spark, sf)
    // every non-suppressed (nation, segment, band) group has >= 5 members
    val released = out.filter($"suppressed" === 0L)
      .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band_out").count()
    assert(released.filter($"count" < 5).isEmpty,
      "a released group smaller than k=5 escaped suppression")
    assert(out.filter($"suppressed" === 1L && $"bal_band_out".isNotNull).isEmpty)
    // total row count preserved: suppression generalizes, never drops
    assert(out.count() == Tables.customer(spark, sf).count())
  }

  test("snapshot_diff: classifies exactly the injected mutation lanes") {
    val diff = Reconcile.snapshotDiff(spark, sf)
      .groupBy($"change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val lanes = Tables.orders(spark, sf)
      .select(expr(
        "conv(substring(md5(cast(o_orderkey AS string)), 1, 15), 16, 10)")
        .cast("long").%(50).as("lane"))
      .groupBy($"lane").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(diff.getOrElse("removed", 0L) == lanes.getOrElse(0L, 0L))
    assert(diff.getOrElse("changed", 0L) == lanes.getOrElse(1L, 0L))
    assert(diff.getOrElse("added", 0L) == lanes.getOrElse(2L, 0L))
  }

  test("partition_reconcile prunes: flags exactly the months the row diff touches") {
    val flagged = Reconcile.partitionReconcile(spark, sf)
      .select($"month").as[String].collect().toSet
    val touched = Reconcile.snapshotDiff(spark, sf)
      .join(
        Tables.normalizeTs(Tables.orders(spark, sf), "o_orderdate")
          .select(
            $"o_orderkey".as("k1"),
            date_format($"o_orderdate", "yyyy-MM").as("m")),
        // 'added' keys carry the +1e9 offset; map back to the source row
        coalesce(
          when($"o_orderkey" >= 1000000000L, $"o_orderkey" - 1000000000L)
            .otherwise($"o_orderkey"), $"o_orderkey") === $"k1")
      .select($"m").as[String].collect().toSet
    assert(flagged == touched, s"flagged $flagged vs touched $touched")
  }
}
