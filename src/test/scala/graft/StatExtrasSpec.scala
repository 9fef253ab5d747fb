package graft

import org.apache.spark.sql.functions._

/** Specs for [[relational.StatExtras]] and [[relational.Experiment
  * .abZtestFdr]]: naive driver-side recomputations (3×3 normal-
  * equation solve, Theil fold, BH step-up) plus the estimator
  * invariants (shrinkage towardness, FDR monotonicity).
  */
class StatExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("ols_multifeature matches a naive driver-side normal-equation solve") {
    val out = relational.StatExtras.olsMultifeature(spark, sf).collect()(0)
    val rows = Tables.lineitem(spark, sf)
      .select(
        round($"l_extendedprice" * 100, 0).cast("long"),
        round($"l_discount" * 10000, 0).cast("long"),
        datediff($"l_shipdate".cast("date"), lit("1970-01-01").cast("date"))
          .cast("long"),
        round($"l_quantity" * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble,
        r.getLong(2).toDouble, r.getLong(3).toDouble))
    val n = rows.length.toDouble
    def s(f: ((Double, Double, Double, Double)) => Double) = rows.map(f).sum
    val (s1, s2, s3, sy) = (s(_._1), s(_._2), s(_._3), s(_._4))
    val a11 = s(r => r._1 * r._1) - s1 * s1 / n
    val a12 = s(r => r._1 * r._2) - s1 * s2 / n
    val a13 = s(r => r._1 * r._3) - s1 * s3 / n
    val a22 = s(r => r._2 * r._2) - s2 * s2 / n
    val a23 = s(r => r._2 * r._3) - s2 * s3 / n
    val a33 = s(r => r._3 * r._3) - s3 * s3 / n
    val b1 = s(r => r._1 * r._4) - s1 * sy / n
    val b2 = s(r => r._2 * r._4) - s2 * sy / n
    val b3 = s(r => r._3 * r._4) - s3 * sy / n
    val det = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    val beta1 = (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
      a13 * (b2 * a23 - a22 * b3)) / det
    assert(out.getAs[Long]("n") == rows.length)
    val got = out.getAs[Double]("beta_price") / 1e6
    assert(math.abs(got - beta1) < math.abs(beta1) * 1e-3 + 1e-9,
      s"beta_price $got vs naive $beta1")
  }

  test("revenue_theil matches a naive fold and is non-negative") {
    val out = relational.StatExtras.revenueTheil(spark, sf).collect()(0)
    val cents = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long")).as("c"))
      .collect().map(_.getAs[Long]("c").toDouble)
    val tot = cents.sum
    val n = cents.length.toDouble
    val t = cents.map(x => x / tot * math.log(n * (x / tot))).sum
    assert(out.getAs[Long]("n_customers") == cents.length)
    assert(math.abs(out.getAs[Double]("theil_t") - t) < 1e-4)
    assert(out.getAs[Double]("theil_t") >= 0.0)
  }

  test("source_rate_shrinkage: every rate moves toward the prior mean") {
    val rows = relational.StatExtras.sourceRateShrinkage(spark, sf).collect()
    assert(rows.nonEmpty)
    val alpha = rows(0).getAs[Double]("alpha")
    val beta = rows(0).getAs[Double]("beta")
    assert(alpha >= 0.0 && beta >= 0.0)
    if (alpha + beta > 0.0) {
      val m = alpha / (alpha + beta)
      for (r <- rows) {
        val raw = r.getAs[Double]("rate_raw")
        val shr = r.getAs[Double]("rate_shrunk")
        assert(math.abs(shr - m) <= math.abs(raw - m) + 1e-6,
          s"${r.getAs[String]("source")}: $raw -> $shr not toward prior $m")
        assert(shr >= 0.0 && shr <= 1.0)
      }
    }
  }

  test("ab_ztest_fdr matches a naive BH step-up on its own p-values") {
    val rows = relational.Experiment.abZtestFdr(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = rows.length
    val sorted = rows.sortBy(r => (r.getAs[Double]("p"),
      r.getAs[String]("event_type")))
    // naive BH from the REPORTED p (6dp); the operator ranks on the
    // 9dp grid, so allow the 6dp-rounding slack in the comparison
    val padjNaive = {
      val arr = sorted.zipWithIndex.map { case (r, i) =>
        r.getAs[Double]("p") * k / (i + 1)
      }
      arr.scanRight(Double.MaxValue)(math.min).init.map(math.min(_, 1.0))
    }
    sorted.zip(padjNaive).foreach { case (r, want) =>
      assert(math.abs(r.getAs[Double]("p_adj") - want) < 1e-4,
        s"${r.getAs[String]("event_type")} p_adj ${r.getAs[Double]("p_adj")} vs $want")
    }
    for (r <- rows) {
      val p = r.getAs[Double]("p")
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getAs[Double]("p_adj") >= p - 1e-4)
      // flag derives from the unrounded p_adj_raw — only assert away
      // from the 6dp rounding boundary
      if (math.abs(r.getAs[Double]("p_adj") - 0.05) > 1e-4)
        assert(r.getAs[Long]("discovery") ==
          (if (r.getAs[Double]("p_adj") <= 0.05) 1L else 0L))
    }
  }
}
