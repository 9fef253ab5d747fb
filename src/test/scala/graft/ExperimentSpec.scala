package graft

import org.apache.spark.sql.functions._

/** Specs for [[relational.Experiment]], [[relational.TsExtras]] and
  * [[relational.Dependence]]: each estimator against a naive
  * driver-side recomputation on the collected fixture, plus the
  * estimator-specific invariants (KM monotonicity, H ≥ 0, MI ≥ 0).
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("ab_cuped_adjust: pooled theta, adjustment identity, rho2 bounds") {
    val rows = relational.Experiment.abCupedAdjust(spark, sf).collect()
    assert(rows.length == 2)
    val thetas = rows.map(_.getAs[Double]("theta")).distinct
    assert(thetas.length == 1, "theta must be pooled (same on both arms)")
    for (r <- rows) {
      val rho2 = r.getAs[Double]("rho2")
      assert(rho2 >= 0.0 && rho2 <= 1.0 + 1e-9)
    }
    // the weighted adjustments cancel: Σ n_a·(adj − raw) = −theta·Σ
    // n_a·(x̄_a − x̄) = 0
    val drift = rows.map(r => r.getAs[Long]("n") *
      (r.getAs[Double]("mean_y_adj") - r.getAs[Double]("mean_y"))).sum
    assert(math.abs(drift) < 1e-2, s"weighted adjustment drift $drift")
  }

  test("ab_diff_in_diff: internal 2x2 consistency") {
    val r = relational.Experiment.abDiffInDiff(spark, sf).collect()(0)
    val did = (r.getAs[Double]("mean_b_post") - r.getAs[Double]("mean_b_pre")) -
      (r.getAs[Double]("mean_a_post") - r.getAs[Double]("mean_a_pre"))
    assert(math.abs(did - r.getAs[Double]("did")) < 1e-4)
    assert(r.getAs[Double]("se") >= 0.0)
    if (r.getAs[Double]("se") > 0.0)
      assert(math.abs(r.getAs[Double]("t_stat") -
        r.getAs[Double]("did") / r.getAs[Double]("se")) < 1e-3)
  }

  test("ab_srm_check: arm counts partition the distinct users") {
    val r = relational.Experiment.abSrmCheck(spark, sf).collect()(0)
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    assert(r.getAs[Long]("srm_alarm") == (if (chi2 > 10.83) 1L else 0L))
  }

  test("kruskal_wallis_value matches a naive driver-side midrank H") {
    val out = relational.Experiment.kruskalWallis(spark, sf).collect()(0)
    val obs = Tables.events(spark, sf)
      .select($"event_type", round($"value" * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = obs.length.toDouble
    // midranks over the pooled sample
    val byVal = obs.map(_._2).groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val midrank = byVal.map { case (v, cnt) =>
      val m = cum + (cnt + 1) / 2.0; cum += cnt; (v, m)
    }.toMap
    val groups = obs.groupBy(_._1)
    val hSum = groups.values.map { g =>
      val rSum = g.map(p => midrank(p._2)).sum
      rSum * rSum / g.length
    }.sum
    val h = 12.0 / (n * (n + 1.0)) * hSum - 3.0 * (n + 1.0)
    assert(out.getAs[Long]("n") == obs.length)
    assert(out.getAs[Long]("n_groups") == groups.size)
    assert(math.abs(out.getAs[Double]("h") - h) < 1e-4,
      s"H ${out.getAs[Double]("h")} vs naive $h")
    assert(out.getAs[Double]("h_adj") >= out.getAs[Double]("h") - 1e-9,
      "tie correction divides by C <= 1, so h_adj >= h")
  }

  test("survival_km_retention matches a naive KM product") {
    val rows = relational.Experiment.survivalKm(spark, sf).collect()
      .sortBy(_.getAs[Long]("t"))
    // fixture users all purchase eventually, so the curve exists
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(min(to_date($"ts")).as("f"),
        min(when($"event_type" === "purchase", to_date($"ts"))).as("c"),
        max(to_date($"ts")).as("l"))
      .collect()
    val horizon = users.map(_.getAs[java.sql.Date]("l").toLocalDate)
      .maxBy(_.toEpochDay)
    val durs = users.map { r =>
      val f = r.getAs[java.sql.Date]("f").toLocalDate
      val c = Option(r.getAs[java.sql.Date]("c")).map(_.toLocalDate)
      c match {
        case Some(cd) => (cd.toEpochDay - f.toEpochDay, true)
        case None     => (horizon.toEpochDay - f.toEpochDay, false)
      }
    }
    var surv = 1.0
    var prevS = 1.0
    var prevT = -1L
    for (row <- rows) {
      val t = row.getAs[Long]("t")
      assert(t > prevT); prevT = t
      val nRisk = durs.count(_._1 >= t).toLong
      val d = durs.count(p => p._1 == t && p._2).toLong
      assert(row.getAs[Long]("n_risk") == nRisk)
      assert(row.getAs[Long]("d") == d)
      surv *= 1.0 - d.toDouble / nRisk
      val s = row.getAs[Double]("surv")
      assert(math.abs(s - surv) < 1e-4, s"S($t) $s vs naive $surv")
      assert(s <= prevS + 1e-9); prevS = s
    }
  }

  test("ts_changepoint matches a naive driver-side argmax") {
    val out = relational.TsExtras.tsChangepoint(spark, sf).collect()(0)
    val daily = Tables.orders(spark, sf)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long")).as("cents"))
      .orderBy($"day").collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Long]("cents")))
    val n = daily.length
    val total = daily.map(_._2.toDouble).sum
    var best = (0, Double.MinValue)
    var run = 0.0
    for (k <- 1 until n) {
      run += daily(k - 1)._2.toDouble
      val gain = run * run / k +
        (total - run) * (total - run) / (n - k) - total * total / n
      if (gain > best._2) best = (k, gain)
    }
    assert(out.getAs[Long]("n_left") == best._1)
    assert(out.getAs[java.sql.Date]("split_day") == daily(best._1 - 1)._1)
    assert(math.abs(out.getAs[Double]("gain") - best._2 / 1e4) <
      math.abs(best._2 / 1e4) * 1e-9 + 1e-3)
  }

  test("ts_hurst_aggvar: per-scale variances match, H in range") {
    val rows = relational.TsExtras.tsHurstAggvar(spark, sf).collect()
    assert(rows.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("c"))
      .orderBy($"h").collect().map(_.getAs[Long]("c"))
    for (r <- rows) {
      val m = r.getAs[Long]("m").toInt
      val blocks = hourly.grouped(m).filter(_.length == m)
        .map(_.sum.toDouble / m).toArray
      assert(r.getAs[Long]("n_blocks") == blocks.length)
      val mean = blocks.sum / blocks.length
      val v = blocks.map(x => (x - mean) * (x - mean)).sum / (blocks.length - 1)
      assert(math.abs(r.getAs[Double]("var_bm") - v) < math.abs(v) * 1e-6 + 1e-6)
    }
    val h = rows(0).getAs[Double]("hurst")
    assert(h > -0.5 && h < 1.5, s"implausible Hurst $h")
    assert(rows.map(_.getAs[Double]("hurst")).distinct.length == 1)
  }

  test("event_mi_hour: information inequalities hold") {
    val r = relational.Dependence.eventMiHour(spark, sf).collect()(0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-9)
    val mi = r.getAs[Double]("mi")
    assert(mi >= -1e-6, "plug-in MI is non-negative")
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6)
    assert(r.getAs[Long]("n_hours") <= 24L)
  }
}
