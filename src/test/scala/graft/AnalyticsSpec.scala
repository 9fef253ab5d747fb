package graft

import org.apache.spark.sql.functions._
import graft.relational.Analytics
import graft.text.DedupCluster

/** Semantics + plan assertions for the analytics catalog and the
  * connected-components dedup clustering. Value-level parity is the
  * DuckDB oracle's job; these pin the invariants the oracle can't see
  * (convergence, plan shape, determinism under re-partitioning).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("dedup cluster labels equal brute-force transitive closure on a synthetic graph") {
    // two chains, one triangle-with-tail, two isolated edges; ids chosen
    // so min-label must travel multiple hops (worst case for propagation)
    val edges = Seq(
      (9L, 8L), (8L, 7L), (7L, 6L), // chain: min 6 must reach 9, 3 hops
      (1L, 5L), (5L, 4L), (4L, 1L), (4L, 12L), // triangle + tail
      (20L, 21L), (30L, 31L)).toDF("doc_a", "doc_b")
    val got = DedupCluster.clustersOfEdges(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      9L -> 6L, 8L -> 6L, 7L -> 6L, 6L -> 6L,
      1L -> 1L, 5L -> 1L, 4L -> 1L, 12L -> 1L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L)
    assert(got == want)
  }

  test("label propagation cuts lineage every round: plan size independent of round count") {
    // The iterative paths checkpoint per round (DedupCluster loop; the
    // PageRank iteration is a driver solve over the <=625-row
    // contraction, so it has no lineage to grow). A regression that
    // drops a localCheckpoint shows up as a logical plan that DEEPENS
    // with every extra round — so compare a diameter-5 chain (~3
    // rounds with pointer jumping) against a diameter-60 chain (~7
    // rounds): the converged frame's plan must not scale with rounds.
    def chain(n: Int) = (0 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    def planLen(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.toString.length
    val short = DedupCluster.clustersOfEdges(chain(5))
    val long = DedupCluster.clustersOfEdges(chain(60))
    assert(long.collect().map(_.getLong(1)).toSet == Set(0L), "chain must collapse to min id")
    val (ls, ll) = (planLen(short), planLen(long))
    assert(ll <= ls * 3 / 2 + 200,
      s"plan grew with rounds (short=$ls chars, long=$ll chars): lineage cut regressed")
    assert(ll < 10000, s"converged plan unexpectedly deep: $ll chars")
  }

  test("pointer jumping IS the large-component escape: 4096-hop path converges in O(log d) rounds") {
    // An adversarial diameter far beyond anything the bucket-capped pair
    // generators can emit — plain hash-min propagation would need 4096
    // rounds and abort at MaxRounds=20; the jump's horizon doubling must
    // land it in ~log2(4096)=12, proving the loop needs no
    // large-star/small-star variant for ANY input diameter the round
    // bound admits (2^18+). See DedupCluster scaladoc for the
    // adjudication this test anchors.
    val n = 4096
    val path = (0 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val got = DedupCluster.clustersOfEdges(path)
    assert(got.collect().map(_.getLong(1)).toSet == Set(0L),
      "path must collapse to its min id")
    val rounds = DedupCluster.lastRounds
    assert(rounds <= 15, s"converged in $rounds rounds — horizon doubling regressed")
  }

  test("CC labels match a union-find oracle on random graphs") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = touched.map { v =>
        val comp = touched.filter(u => find(u.toInt) == find(v.toInt))
        v -> comp.min
      }.toMap
      val got = DedupCluster.clustersOfEdges(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
    }
  }

  test("local union-find path == distributed propagation on random graphs") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 80
      val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).toDF("doc_a", "doc_b")
      val dist = DedupCluster.clustersOfEdges(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val loc = DedupCluster.clustersOfEdgesLocal(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(loc == dist)
    }
  }

  test("stratified_topn: exactly K rows per source, ranks 1..K") {
    val rows = Analytics.stratifiedTopN(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(bySource.size == nSources)
    bySource.values.foreach { g =>
      assert(g.length == Analytics.StratTopN)
      assert(g.map(_.getLong(2)).sorted.toSeq == (1L to Analytics.StratTopN))
    }
  }

  test("decontam: benchmark docs excluded; hits bounded by grams; flag consistent") {
    import graft.pipeline.Decontam
    val out = Decontam.flagContaminated(spark, sf).collect()
    val benchIds = Tables.documents(spark, sf)
      .filter($"source" === Decontam.BenchSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!benchIds.contains(r.getLong(0)), "benchmark doc leaked into train output")
      val (grams, hits, flag) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hits >= 0 && hits <= grams)
      assert(flag == (if (hits > 0) 1L else 0L))
    }
    // output covers every non-benchmark doc exactly once
    val total = Tables.documents(spark, sf)
      .filter($"source" =!= Decontam.BenchSource).count()
    assert(out.length == total)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }

  test("survivors = documents minus non-keepers, per source") {
    import org.apache.spark.sql.functions.{count => fcount}
    val nonKeepers = DedupCluster.clusters(spark, sf)
      .filter($"is_keeper" === 0).count()
    val total = Tables.documents(spark, sf).count()
    val surv = DedupCluster.survivors(spark, sf)
      .agg(sum($"n_docs")).first().getLong(0)
    assert(surv == total - nonKeepers)
  }

  test("dedup clusters: every member maps to the component min; keepers are the minima") {
    val rows = DedupCluster.clusters(spark, sf).collect()
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid, s"cluster $cid id is not its min member")
      assert(members.count(_.getLong(2) == 1L) == 1, s"cluster $cid keeper count != 1")
      assert(members.find(_.getLong(2) == 1L).get.getLong(0) == cid)
      assert(members.length >= 2, s"singleton cluster $cid emitted")
    }
  }

  test("funnel stages are monotonically non-increasing") {
    val m = Analytics.funnelStages(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("view") >= m("view>click"))
    assert(m("view>click") >= m("view>click>purchase"))
    assert(m("view") > 0)
  }

  test("cohort retention months_since=0 matches cohort sizes and bounds cells") {
    val rows = Analytics.cohortRetention(spark, sf).collect()
    val zero = rows.filter(_.getLong(1) == 0L)
    // every cohort has a months_since=0 cell, and no later cell exceeds it
    rows.groupBy(_.getDate(0)).foreach { case (cm, cells) =>
      val base = cells.find(_.getLong(1) == 0L)
      assert(base.isDefined, s"cohort $cm missing its base cell")
      assert(cells.forall(_.getLong(2) <= base.get.getLong(2)),
        s"cohort $cm has a retention cell above its base size")
    }
    assert(zero.nonEmpty)
  }

  test("sessions concurrency conserves session-hours") {
    // sum over hours of active counts == sum over sessions of hours covered
    val hourly = Analytics.sessionsConcurrency(spark, sf)
      .agg(sum($"n_active")).as[Long].head()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val direct = Tables.events(spark, sf)
      .withColumn("new_sess",
        when(lag($"ts", 1).over(w).isNull ||
          ($"ts" - lag($"ts", 1).over(w) > expr("INTERVAL '30' MINUTE")), 1L).otherwise(0L))
      .withColumn("sess", sum($"new_sess").over(cum))
      .groupBy($"user_id", $"sess")
      .agg((floor(unix_timestamp(date_trunc("hour", max($"ts"))) / 3600) -
        floor(unix_timestamp(date_trunc("hour", min($"ts"))) / 3600) + 1).as("hrs"))
      .agg(sum($"hrs")).as[Long].head()
    assert(hourly == direct)
  }

  test("scd2 intervals chain: valid_to equals the next interval's valid_from") {
    val rows = Analytics.scd2Compaction(spark, sf)
      .orderBy($"o_custkey", $"valid_from").collect()
    rows.groupBy(_.getLong(0)).values.foreach { ivs =>
      ivs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDate(3) == b.getDate(2),
            s"interval chain broken for customer ${a.getLong(0)}")
          assert(a.getString(1) != b.getString(1),
            "adjacent intervals share a status — compaction failed")
        case _ =>
      }
      assert(ivs.last.isNullAt(3), "open interval must have NULL valid_to")
    }
  }

  test("histogram buckets partition the row count exactly") {
    val rows = Analytics.histogramPrices(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val n = Tables.lineitem(spark, sf).count()
    assert(total == n)
    assert(rows.map(_.getLong(0)).forall(b => b >= 0 && b <= 20))
  }

  test("stratified sample rates land near targets and are rerun-stable") {
    val once = Analytics.stratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = Analytics.stratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == again, "content-hash sample must be deterministic")
    val totals = Tables.orders(spark, sf).groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Analytics.SampleRates.foreach { case (p, rate) =>
      val got = once.getOrElse(p, 0L).toDouble / totals(p)
      assert(math.abs(got - rate) < 0.08,
        s"stratum $p sampled at $got, target $rate")
    }
  }

  test("data quality audit is all-green on the generated data") {
    val m = Analytics.dataQualityAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("orders_rows") > 0 && m("lineitem_rows") > 0 && m("documents_rows") > 0)
    Seq("orders_null_custkey", "orders_dup_orderkey", "orders_nonpositive_price",
      "lineitem_bad_discount", "lineitem_nonpositive_qty", "documents_dup_id",
      "documents_empty_text", "orders_orphan_custkey", "lineitem_orphan_orderkey")
      .foreach(k => assert(m(k) == 0L, s"check $k flagged ${m(k)} rows"))
  }

  test("funnel runs on ONE data-scale shuffle; zscore stats join broadcasts") {
    // funnel: both qualification windows and the per-user aggregate share
    // the user_id partitioning — exactly one hash exchange (the remaining
    // SinglePartition exchange carries 3 constant-size counters)
    val fp = Analytics.funnelStages(spark, sf).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(fp).length == 1,
      "funnel should shuffle once on user_id:\n" + fp)
    val zp = Analytics.anomalyZscore(spark, sf).queryExecution.executedPlan.toString
    assert(zp.contains("BroadcastNestedLoopJoin") || zp.contains("BroadcastExchange"),
      "one-row stats join should broadcast:\n" + zp)
  }

  test("bm25 and tfidf scores are positive and ranked") {
    val bm = graft.text.Retrieval.bm25Search(spark, sf).collect()
    assert(bm.length <= graft.text.Retrieval.TopDocs && bm.nonEmpty)
    val scores = bm.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "bm25 output not rank-ordered")
    val tf = graft.text.Retrieval.tfidfTopk(spark, sf)
      .groupBy($"doc_id").count().collect()
    assert(tf.forall(_.getLong(1) <= graft.text.Retrieval.TopTerms))
  }

  test("event transition probabilities sum to 1 per source type") {
    val rows = Analytics.eventTransitions(spark, sf).collect()
    rows.groupBy(_.getString(0)).values.foreach { ts =>
      val s = ts.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"probs sum to $s")
    }
  }

  test("gap fill: null only before the first reading, never after") {
    val rows = Analytics.windowGapFill(spark, sf)
      .orderBy($"user_id", $"event_id").collect()
    rows.groupBy(_.getLong(1)).values.foreach { evs =>
      val filled = evs.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      val firstVal = filled.indexWhere(_.isDefined)
      if (firstVal >= 0)
        assert(filled.drop(firstVal).forall(_.isDefined),
          "null after a non-null reading — forward fill broken")
    }
  }

  test("fuzzy name pairs stay within blocks and the edit bound") {
    val rows = Analytics.fuzzyPartNames(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= Analytics.MaxEditDistance)
      assert(r.getString(0) < r.getString(1))
      assert(r.getString(0).split(" ").last == r.getString(1).split(" ").last)
    }
  }

  test("weighted sample plans TakeOrderedAndProject and favors heavy orders") {
    val df = Analytics.weightedSample(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "weighted sample fell back to global sort:\n" + p)
    val sampleAvg = df.agg(avg($"o_totalprice")).first().getDouble(0)
    val popAvg = Tables.orders(spark, sf).agg(avg($"o_totalprice")).first().getDouble(0)
    assert(sampleAvg > popAvg, "price-weighted sample should skew above the population mean")
  }

  test("basket pairs: per-order fan-out is C(k,2) and top-k avoids a global sort") {
    import graft.relational.Analytics
    val items = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
    val expectedPairs = items.groupBy($"l_orderkey").count()
      .select(sum($"count" * ($"count" - 1) / 2).cast("long")).as[Long].head()
    val allPairs = {
      val a = items.select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      val b = items.select($"l_orderkey".as("ok"), $"l_partkey".as("pk_b"))
      a.join(b, a("ok") === b("ok") && $"pk" < $"pk_b").count()
    }
    assert(allPairs == expectedPairs)
    val top = Analytics.basketPairs(spark, sf)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    val rows = top.collect()
    assert(rows.length <= Analytics.BasketTopK && rows.nonEmpty)
    // ranked: counts non-increasing
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
  }

  test("basket cap: a planted 10k-item basket cannot explode the pair stage") {
    // Mirrors TextDedupSpec's all-duplicates bucket-cap stress: one
    // degenerate cart with 10,000 distinct parts (C(10k,2) ~ 5e7 raw
    // pairs) plus two normal orders. The MaxBasket slice must bound the
    // degenerate order to C(MaxBasket,2) pairs over its LOWEST part ids,
    // and leave small baskets untouched.
    val giant = (1L to 10000L).map(p => (999999L, p))
    val normal = Seq((1L, 50011L), (1L, 50012L), (1L, 50013L),
      (2L, 50011L), (2L, 50012L))
    val items = (giant ++ normal).toDF("l_orderkey", "l_partkey")
    val counts = Analytics.basketPairCounts(items).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val m = Analytics.MaxBasket.toLong
    // pairs from the giant order: exactly C(MaxBasket,2), ids 1..MaxBasket
    val giantPairs = counts.keys.filter { case (a, b) => a <= m && b <= m }
    assert(giantPairs.size == (m * (m - 1) / 2).toInt,
      s"cap must bound the degenerate basket to C($m,2) pairs")
    assert(counts.keys.forall { case (a, b) =>
      (a <= m && b <= m) || (a >= 50011L && b <= 50013L)
    }, "giant-order pairs must stay within the capped (lowest-id) basket")
    // small baskets (under the cap) are untouched by the slice
    assert(counts((50011L, 50012L)) == 2L && counts((50011L, 50013L)) == 1L)
  }

  test("label centroids cover every (label, dim) cell exactly once") {
    val rows = graft.sim.Similarity.labelCentroids(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).select($"label").distinct().count()
    assert(rows.length == labels * 64)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("cohort_ltv: cumulative monotone, ties to naive recount, age-0 identity") {
    val rows = relational.Analytics.cohortLtv(spark, sf).collect()
      .map(r => ((r.getDate(0).toString, r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4))))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1._1)
    for ((_, rs) <- byCohort) {
      val o = rs.sortBy(_._1._2)
      // cumulative = running sum of period revenue, monotone
      var run = 0.0
      for (((_, _), (_, rev, cum)) <- o) {
        run += rev
        assert(math.abs(cum - run) < 1e-6)
      }
      // age 0 must exist (the cohort's defining first-order month)
      assert(o.head._1._2 == 0L)
      assert(o.head._2._2 == o.head._2._3)
    }
    // naive recount of one cell
    val om = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderdate".cast("date"), $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0),
        r.getDate(1).toLocalDate.getYear * 12 + r.getDate(1).toLocalDate
          .getMonthValue,
        math.round(r.getDouble(2) * 100)))
    val first = om.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
    val cell = om.filter(o => o._2 == first(o._1))
      .groupBy(o => first(o._1))
    for ((m0, xs) <- cell.take(3)) {
      val ym = java.time.LocalDate.of((m0 - 1) / 12, (m0 - 1) % 12 + 1, 1)
      val got = rows.toMap.apply((ym.toString, 0L))
      assert(got._1 == xs.length)
      assert(math.abs(got._2 - xs.map(_._3).sum / 100.0) < 1e-6)
    }
  }

  test("quantile_transform: monotone, max 1000, naive recount on a sample") {
    val rows = relational.Analytics.quantileTransformValues(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val vals = Tables.events(spark, sf).select($"value").collect()
      .map(x => math.round(x.getDouble(0) * 100))
    assert(rows.length == vals.length)
    assert(rows.map(_._3).max == 1000L)
    // monotone: sort by value, cdf never decreases
    val byV = rows.sortBy(_._2)
    byV.zip(byV.drop(1)).foreach { case (a, b) => assert(a._3 <= b._3) }
    // naive recount on 20 rows
    val sorted = vals.sorted
    for (r <- rows.take(20)) {
      val c = math.round(r._2 * 100)
      val want = sorted.count(_ <= c).toLong * 1000 / vals.length
      assert(r._3 == want, s"event ${r._1}: ${r._3} vs $want")
    }
  }

  test("target_encode_loo == naive; pair sources encode each other's value") {
    val rows = relational.Analytics.targetEncodeLoo(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._2)
    assert(rows.length == docs.length)
    for (r <- rows.take(50)) {
      val (s, x) = (r.getString(1), r.getLong(2))
      val peers = bySrc(s)
      if (peers.length > 1) {
        val want = BigDecimal(
          (peers.map(_._3).sum - x).toDouble / (peers.length - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("loo_mean_chars") == want)
      } else assert(r.isNullAt(3))
    }
    // planted: exactly two docs per source -> each encodes the other
    val tmp = java.nio.file.Files.createTempDirectory("graftloo")
    Seq((1L, "x", "en", "s1", 100L), (2L, "y", "en", "s1", 300L),
      (3L, "z", "en", "solo", 42L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val p = relational.Analytics.targetEncodeLoo(spark, tmp.toString)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(p(1L).contains(300.0) && p(2L).contains(100.0))
    assert(p(3L).isEmpty)
  }

  test("ab_uplift_bootstrap: units tie to ztest, CI ordered and brackets the point") {
    val r = relational.Analytics.abUpliftBootstrap(spark, sf).collect()(0)
    val z = relational.Analytics.abConversionZtest(spark, sf).collect()(0)
    // identical unit construction on both operators
    assert(r.getAs[Long]("n_a") == z.getAs[Long]("n_a"))
    assert(r.getAs[Long]("n_b") == z.getAs[Long]("n_b"))
    val up = r.getAs[Double]("uplift")
    val want = BigDecimal(
      z.getAs[Long]("x_a").toDouble / z.getAs[Long]("n_a") -
        z.getAs[Long]("x_b").toDouble / z.getAs[Long]("n_b"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(up == want)
    assert(r.getAs[Long]("n_resamples") == relational.StatModels.BootB)
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo <= hi)
    // on the fixture the resample spread brackets the point estimate
    assert(lo <= up && up <= hi, s"CI [$lo, $hi] vs point $up")
    // resamples are deterministic: a rerun is bit-identical
    val r2 = relational.Analytics.abUpliftBootstrap(spark, sf).collect()(0)
    assert(r2.getAs[Double]("ci_lo") == lo && r2.getAs[Double]("ci_hi") == hi)
  }

  test("ab_conversion_ztest == naive per-user recount; planted split maxes |z|") {
    val r = relational.Analytics.abConversionZtest(spark, sf).collect()(0)
    val users = Tables.events(spark, sf)
      .select($"user_id", to_date($"ts").as("day"), $"event_type").collect()
      .map(x => ((x.getLong(0), x.getDate(1).toString), x.getString(2)))
      .groupBy(_._1).toSeq
      .filter(_._2.exists(_._2 == "click"))
      .map { case ((u, _), es) => (u, es.exists(_._2 == "purchase")) }
    val a = users.filter(_._1 % 2 == 0); val b = users.filter(_._1 % 2 == 1)
    assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
    assert(r.getAs[Long]("x_a") == a.count(_._2))
    assert(r.getAs[Long]("x_b") == b.count(_._2))
    val (na, xa) = (a.size.toDouble, a.count(_._2).toDouble)
    val (nb, xb) = (b.size.toDouble, b.count(_._2).toDouble)
    val pool = (xa + xb) / (na + nb)
    val se = math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    // degenerate pooled rate (0 or 1): the query's guard pins z to 0
    val z = if (se > 0.0) (xa / na - xb / nb) / se else 0.0
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5,
      s"z ${r.getAs[Double]("z")} vs naive $z")
    // planted: every even user converts, no odd user does -> z maximal
    val tmp = java.nio.file.Files.createTempDirectory("graftab")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    ((1 to 200).map(i => (i.toLong, ts0, i.toLong, "click", 1.0, "{}")) ++
      (1 to 200).filter(_ % 2 == 0).map(i =>
        (1000L + i, ts0, i.toLong, "purchase", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val p = relational.Analytics.abConversionZtest(spark, tmp.toString)
      .collect()(0)
    assert(p.getAs[Double]("p_a") == 1.0 && p.getAs[Double]("p_b") == 0.0)
    // p-pooled = 1/2: z = 1 / sqrt(0.25 * (2/100)) = sqrt(200)
    assert(math.abs(p.getAs[Double]("z") - math.sqrt(200.0)) < 1e-3)
  }
}
