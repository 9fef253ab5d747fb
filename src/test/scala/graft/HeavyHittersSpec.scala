package graft

import org.apache.spark.sql.functions._
import graft.text.HeavyHitters

/** The two properties the oracle can't check: the MG candidate pass is a
  * superset of every qualifying item REGARDLESS of partitioning, and the
  * two-pass output equals the naive full-shuffle plan.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries survivors include every item with count > n/k") {
    val rnd = new scala.util.Random(11)
    // skewed stream: few heavy items + a long random tail
    val stream = Seq.fill(5000)(
      if (rnd.nextInt(10) < 4) s"heavy${rnd.nextInt(3)}"
      else s"tail${rnd.nextInt(2000)}")
    val k = 50
    val survivors = HeavyHitters.misraGries(stream.iterator, k).toSet
    val counts = stream.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val mustKeep = counts.filter(_._2 > stream.size / k).keySet
    assert(mustKeep.subsetOf(survivors),
      s"MG evicted qualifying items: ${mustKeep -- survivors}")
    assert(survivors.size <= k)
  }

  test("two-pass heavy hitters equal the naive full-shuffle plan, at any partitioning") {
    val naive = Tables.documents(spark, sf)
      .select(explode(graft.text.TextAnalysis.toks($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val total = naive.agg(sum($"cnt")).first().getLong(0)
    val want = naive.filter($"cnt" * 1000 >= total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.frequentTokens(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("CMS estimates bound exact counts, and per-source merge == one global sketch") {
    val total = Tables.documents(spark, sf)
      .select(explode(graft.text.TextAnalysis.toks($"text")).as("tok")).count()
    val rows = HeavyHitters.cmsTokenEstimates(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, cnt, est) =>
      assert(est >= cnt, s"$t: CMS underestimated ($est < $cnt)")
      assert(est <= cnt + (HeavyHitters.CmsEps * total).toLong + 1,
        s"$t: estimate $est above eps bound for exact $cnt")
    }
    // merging per-source sketches must equal sketching the whole corpus
    // in one aggregate (counter-wise sum with identical seeded hashes)
    val globalBytes = Tables.documents(spark, sf)
      .select(explode(graft.text.TextAnalysis.toks($"text")).as("tok"))
      .agg(expr(s"count_min_sketch(tok, ${HeavyHitters.CmsEps}d, " +
        s"${HeavyHitters.CmsConf}d, ${HeavyHitters.CmsSeed})"))
      .as[Array[Byte]].head()
    val global = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(globalBytes))
    rows.foreach { case (t, _, est) =>
      assert(global.estimateCount(t) == est,
        s"$t: merged-sketch estimate differs from global sketch")
    }
  }

  test("dataflow CMS never underestimates; overcount within the width bound") {
    val total = Tables.documents(spark, sf)
      .select(explode(graft.text.TextAnalysis.toks($"text")).as("tok")).count()
    val rows = HeavyHitters.cmsDataflowEstimates(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, cnt, est) =>
      // hard CMS guarantee: a row's own counts always land in its cell
      assert(est >= cnt, s"$t: CMS underestimated ($est < $cnt)")
      // expected overcount per cell is total/width; 8x slack keeps the
      // deterministic fixture check far from flakiness
      assert(est - cnt <= 8 * total / HeavyHitters.CmsWidth + 1,
        s"$t: overcount ${est - cnt} above width bound")
    }
  }

  test("dataflow HLL estimates user-day cardinality within sketch error") {
    val rows = HeavyHitters.hllDataflowDistinct(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, exact, est) =>
      // raw HLL std error is 1.04/sqrt(64) ~ 13%; the fixture sits at
      // the n ~ 2.5m edge of the raw regime, so allow 3 sigma + regime
      // slack — deterministic data, so this can never flake
      assert(est > 0, s"$et: non-positive estimate")
      assert(math.abs(est - exact).toDouble / exact <= 0.6,
        s"$et: estimate $est too far from exact $exact")
    }
  }

  test("hll_intersection: inclusion-exclusion identity holds; exact companions tie out") {
    val r = HeavyHitters.hllIntersection(spark, sf).collect()(0)
    // exact companions against an independent driver recount
    import org.apache.spark.sql.functions._
    val keys = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        concat(col("user_id").cast("string"), lit("@"),
          to_date(col("ts")).cast("string")).as("k"))
      .distinct().collect().map(x => (x.getString(0), x.getString(1)))
    val a = keys.filter(_._1 == "click").map(_._2).toSet
    val b = keys.filter(_._1 == "view").map(_._2).toSet
    assert(r.getAs[Long]("n_exact_click") == a.size)
    assert(r.getAs[Long]("n_exact_view") == b.size)
    assert(r.getAs[Long]("n_exact_both") == (a & b).size)
    // the estimate triple satisfies inclusion-exclusion BY CONSTRUCTION
    assert(r.getAs[Long]("est_both") ==
      r.getAs[Long]("est_click") + r.getAs[Long]("est_view") -
        r.getAs[Long]("est_union"))
    // union register merge can only lower the union estimate's s —
    // union est >= max of the per-type ests
    assert(r.getAs[Long]("est_union") >=
      math.max(r.getAs[Long]("est_click"), r.getAs[Long]("est_view")))
    // sketch regime: overlap estimate lands within coarse sketch error
    val exact = (a & b).size
    assert(math.abs(r.getAs[Long]("est_both") - exact).toDouble /
      math.max(exact, 1) <= 0.8,
      s"est_both ${r.getAs[Long]("est_both")} vs exact $exact")
  }

  test("hll_rollup_merge: day->month register merge is lossless, estimate sane") {
    val rows = HeavyHitters.hllRollupMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // THE invariant: register max is associative, so folding per-day
      // sketches equals the from-scratch month sketch exactly
      assert(r.getAs[Boolean]("merge_lossless"),
        s"month ${r.getLong(0)}: merged ${r.getAs[Long]("est_merged")} != " +
          s"direct ${r.getAs[Long]("est_direct")}")
      val exact = r.getAs[Long]("n_exact_users")
      val est = r.getAs[Long]("est_merged")
      assert(est > 0)
      assert(math.abs(est - exact).toDouble / math.max(exact, 1) <= 0.6,
        s"est $est too far from exact $exact")
      assert(r.getAs[Long]("n_days") >= 1)
    }
  }

  test("cms_join_size: exact == naive inner product; estimate never undercounts") {
    val r = HeavyHitters.cmsJoinSize(spark, sf).collect()(0)
    val fa = Tables.events(spark, sf).select(col("user_id")).collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val fb = Tables.orders(spark, sf).select(col("o_custkey")).collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val exact = fa.keys.map(k => fa(k) * fb.getOrElse(k, 0L)).sum
    assert(r.getAs[String]("exact_size").toLong == exact)
    assert(r.getAs[Long]("n_a") == fa.values.sum)
    assert(r.getAs[Long]("n_b") == fb.values.sum)
    // CMS inner product only ADDS colliding mass: est >= exact always
    val est = BigInt(r.getAs[String]("est_size"))
    assert(est >= BigInt(exact), s"undercount: $est < $exact")
    assert(r.getAs[Double]("overcount_ratio") >= 1.0)
    // and within the width bound's coarse regime on the fixture
    assert(r.getAs[Double]("overcount_ratio") < 3.0,
      s"ratio ${r.getAs[Double]("overcount_ratio")} suspiciously loose")
  }
}
