package graft

import org.apache.spark.sql.functions._
import graft.relational.TpchMore

/** Plan-shape + invariant checks for the second TPC-H analog wave.
  * Value-level parity is the DuckDB oracle's job; these pin what the
  * oracle can't see: join strategies and cross-query conservation.
  */
class TpchMoreSpec extends SparkSpec {
  import spark.implicits._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q7/q8/q9 join all dimensions via broadcast (facts never SMJ a dim)") {
    for (q <- Seq("q7_nation_volume", "q8_market_share", "q9_profit")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcasts:\n$p")
    }
  }

  test("q4 compiles EXISTS to a semi join, q22 compiles NOT EXISTS to an anti join") {
    assert(plan("q4_priority_late").contains("LeftSemi"))
    assert(plan("q22_wealthy_inactive").contains("LeftAnti"))
  }

  test("q8 market share is a genuine fraction in [0, 1]") {
    val shares = TpchMore.q8MarketShare(spark, sf)
      .collect().map(_.getDouble(1))
    assert(shares.nonEmpty)
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("q13 histogram conserves the customer count") {
    val total = Tables.customer(spark, sf).count()
    val hist = TpchMore.q13OrderCounts(spark, sf)
      .agg(sum($"custdist")).first().getLong(0)
    assert(hist == total)
  }

  test("q19's disjunctive bands are disjoint-by-brand: per-band sums add up") {
    val all = TpchMore.q19Disjunctive(spark, sf).first()
    val l = Tables.lineitem(spark, sf)
    val p = Tables.part(spark, sf)
    val joined = l.join(p, $"l_partkey" === $"p_partkey")
    val bands = Seq(
      ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)),
      ($"p_brand" === "Brand#18" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)),
      ($"p_brand" === "Brand#23" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30)))
    val perBand = bands.map(b => joined.filter(b).count()).sum
    assert(all.getLong(1) == perBand)
  }

  test("q11 matches a driver-side recount of shares above the threshold") {
    val got = TpchMore.q11ImportantParts(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val rev = Tables.lineitem(spark, sf)
      .groupBy($"l_partkey")
      .agg(relational.RelQueries.exactSum(
        $"l_extendedprice" * (lit(1) - $"l_discount"), 10000L).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // replicate exactSum(part_rev, 10000) exactly: re-snap each double to
    // its long grid, sum as long, rescale — bit-identical to the query
    val total = rev.map(r => math.round(r._2 * 10000)).sum.toDouble / 10000
    val want = rev.filter(_._2 > total * 0.0008).map(_._1).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
