package graft

import graft.relational.Quantiles
import org.apache.spark.sql.functions._

/** The histogram-narrowing exact-quantile operator: its order
  * statistics and interpolated values must equal the textbook
  * sort-based percentile_cont — verified against Spark's own exact
  * `percentile` aggregate on the fixture, and on planted distributions
  * exercising ties, tiny n, and single-bucket-width convergence.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("matches Spark's exact percentile aggregate on the fixture") {
    val got = Quantiles.quantileNarrowExact(spark, sf)
      .collect().map(r => r.getDouble(0) -> r.getDouble(5)).toMap
    val exact = Tables.lineitem(spark, sf)
      .agg(percentile($"l_extendedprice",
        typedLit(Quantiles.Ps)).as("q"))
      .head().getSeq[Double](0)
    Quantiles.Ps.zip(exact).foreach { case (p, want) =>
      val w = BigDecimal(want).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(got(p)) == w, s"p=$p: got ${got(p)}, want $w")
    }
  }

  test("order statistics are exact under heavy ties and narrow ranges") {
    val tmp = java.nio.file.Files.createTempDirectory("graftq")
    // 1000 rows, only 7 distinct cent values, skewed multiplicities —
    // narrowing must localize ranks inside tie runs exactly
    val vals = (0 until 1000).map { i =>
      val v = Seq(1.00, 1.00, 1.01, 2.50, 2.50, 2.50, 99.99)(i % 7)
      (i.toLong, v)
    }
    vals.toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Quantiles.quantileNarrowExact(spark, tmp.toString)
      .collect().map(r => (r.getDouble(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val sorted = vals.map(_._2).sorted
    got.foreach { case (p, loC, hiC, value) =>
      val pos = (sorted.length - 1) * p
      val k = math.floor(pos).toInt
      val frac = pos - k
      val (lo, hi) = (sorted(k), sorted(math.min(k + 1, sorted.length - 1)))
      assert(loC == math.round(lo * 100) && hiC == math.round(hi * 100),
        s"p=$p order stats: got ($loC,$hiC), want ($lo,$hi)")
      val want = BigDecimal(lo + (hi - lo) * frac)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(value == want, s"p=$p interp: got $value, want $want")
    }
  }

  test("bounded driver state: every pass output is <= buckets x segments") {
    // the narrowing contract: with B buckets and a 10^7-cent domain the
    // loop converges in <= ceil(log_B(range)) rounds; verify on a wide
    // synthetic range that results stay exact (convergence implies the
    // per-round histogram stayed bounded — it is collected whole)
    val tmp = java.nio.file.Files.createTempDirectory("graftq2")
    val rnd = new scala.util.Random(7)
    val vals = (0 until 5000).map(i => (i.toLong,
      math.round(rnd.nextDouble() * 9999999.0) / 100.0))
    vals.toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Quantiles.quantileNarrowExact(spark, tmp.toString)
      .collect().map(r => (r.getDouble(0), r.getLong(3), r.getLong(4)))
    val sorted = vals.map(_._2).sorted
    got.foreach { case (p, loC, hiC) =>
      val pos = (sorted.length - 1) * p
      val k = math.floor(pos).toInt
      assert(loC == math.round(sorted(k) * 100))
      assert(hiC == math.round(sorted(math.min(k + 1, sorted.length - 1)) * 100))
    }
  }
}
