package graft

import org.apache.spark.sql.functions._
import graft.relational.{Graph, TimeSeries}

/** Invariants the oracle can't see for the graph + time-series wave:
  * brute-force triangle parity on synthetic graphs, PageRank mass
  * conservation, EWMA convexity.
  */
class GraphTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("triangles match brute force on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 25
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val es = edges.toSet
      val want = (for {
        (a, b) <- edges
        c <- (b + 1) to n.toLong
        if es.contains((b, c)) && es.contains((a, c))
      } yield (a, b, c)).toSet
      val got = Graph.trianglesOfEdges(edges.toDF("a", "b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    }
  }

  test("each emitted triangle is strictly ordered a < b < c (no duplicates)") {
    val tri = Graph.triangles(spark, sf).collect()
    assert(tri.forall(r => r.getLong(0) < r.getLong(1) && r.getLong(1) < r.getLong(2)))
    assert(tri.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).distinct.length
      == tri.length)
  }

  test("pagerank: 25 nodes, positive ranks, total mass ~1") {
    val ranks = Graph.pagerankNations(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 25)
    assert(ranks.values.forall(_ > 0))
    val mass = ranks.values.sum
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass drifted: $mass")
  }

  test("EWMA is a convex combination: min(value) <= ewma <= max(value) per user") {
    val perUser = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    val joined = TimeSeries.ewmaUserValue(spark, sf)
      .join(perUser, "user_id")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ewma, lo, hi) =
        (r.getAs[Double]("ewma"), r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(ewma >= lo - 1e-6 && ewma <= hi + 1e-6)
    }
  }

  test("ts_interpolate: observed hours exact, gaps bracketed, edges null") {
    val out = TimeSeries.interpolateHourly(spark, sf).cache()
    try {
      // Every user's grid is dense: rows == span hours + 1, no duplicate hours.
      val spans = out.groupBy($"user_id")
        .agg(count(lit(1)).as("n"), countDistinct($"h").as("nh"),
          ((max($"h".cast("long")) - min($"h".cast("long"))) / 3600 + 1).as("want"))
        .collect()
      assert(spans.nonEmpty)
      spans.foreach { r =>
        assert(r.getAs[Long]("n") == r.getAs[Double]("want").toLong)
        assert(r.getAs[Long]("n") == r.getAs[Long]("nh"))
      }
      // Interpolated values lie strictly inside their neighbors' range:
      // every non-observed non-null value is within [user min, user max].
      val bounds = out.filter($"is_observed" === 1)
        .groupBy($"user_id").agg(min($"value").as("lo"), max($"value").as("hi"))
      val bad = out.filter($"is_observed" === 0 && $"value".isNotNull)
        .join(bounds, "user_id")
        .filter($"value" < $"lo" - 1e-9 || $"value" > $"hi" + 1e-9)
        .count()
      assert(bad == 0)
      // First and last hour of every user are observed (no extrapolation),
      // so null values only ever appear strictly between observations.
      val edges = out.groupBy($"user_id")
        .agg(min(struct($"h", $"is_observed")).as("f"),
          max(struct($"h", $"is_observed")).as("l"))
        .filter($"f.is_observed" === 0 || $"l.is_observed" === 0)
        .count()
      assert(edges == 0)
    } finally out.unpersist()
  }

  test("ts_cusum closed form == the textbook max(0, s+d) recurrence") {
    val rows = relational.TimeSeries.tsCusum(spark, sf)
      .orderBy("day").collect()
    val cents = rows.map(r => math.round(r.getDouble(1) * 100))
    val n = cents.length.toLong
    val ref = cents.sum / n
    val slack = ref / relational.TimeSeries.CusumSlackDiv
    var s = 0L
    rows.zip(cents).foreach { case (r, c) =>
      s = math.max(0L, s + (c - ref - slack))
      assert(r.getLong(2) == s, s"day ${r.getDate(0)}: got ${r.getLong(2)}, want $s")
      assert(r.getBoolean(3) == (s > ref))
    }
  }

  test("ts_cusum: a planted level shift alarms after the shift, never before") {
    val tmp = java.nio.file.Files.createTempDirectory("graftcus")
    // 60 flat days at $100, then 30 days at $300 — the alarm must be
    // silent through the flat prefix and latch within the shifted block
    val rows = (0 until 90).map { i =>
      val day = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00")
        .toLocalDateTime.plusDays(i)
      (i.toLong, java.sql.Timestamp.valueOf(day),
        if (i < 60) 100.0 else 300.0)
    }
    rows.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = relational.TimeSeries.tsCusum(spark, tmp.toString)
      .orderBy("day").collect()
    val alarms = got.map(_.getBoolean(3))
    assert(!alarms.take(60).exists(identity), "false alarm in the flat prefix")
    assert(alarms.drop(60).exists(identity), "shift never alarmed")
    // once latched in a sustained shift, it stays latched
    val first = alarms.indexOf(true)
    assert(alarms.drop(first).forall(identity))
  }

  test("ts_seasonal_decompose: edges null, trend exact, residual identity") {
    val rows = relational.TimeSeries.tsSeasonalDecompose(spark, sf)
      .orderBy("day").collect()
    val cents = rows.map(r => math.round(r.getDouble(1) * 100))
    // 3-day edges carry no trend; interior trend is the exact 7-day sum
    (0 until 3).foreach { i =>
      assert(rows(i).isNullAt(2) && rows(rows.length - 1 - i).isNullAt(2))
    }
    (3 until rows.length - 3).foreach { i =>
      val t7 = (i - 3 to i + 3).map(cents(_)).sum
      assert(rows(i).getDouble(2) == t7.toDouble / 700,
        s"trend at $i: ${rows(i).getDouble(2)}")
    }
    // seasonal: one value per weekday, shared by all rows of that dow
    val byDow = rows.filter(!_.isNullAt(4)).groupBy(_.getLong(3))
    assert(byDow.keySet == (0L to 6L).toSet)
    byDow.values.foreach(g => assert(g.map(_.getDouble(4)).distinct.length == 1))
    // residual ~ det/700 - seasonal (both 6dp-rounded; check on the grid)
    (3 until rows.length - 3).foreach { i =>
      val det = 7L * cents(i) - (i - 3 to i + 3).map(cents(_)).sum
      val approx = det.toDouble / 700.0 - rows(i).getDouble(4)
      assert(math.abs(rows(i).getDouble(5) - approx) < 2e-6)
    }
  }

  test("markov_stationary pi_e6 == exact Long replay of the e6 iteration") {
    val got = relational.Graph.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver replay: lead-derived transition counts, then the identical
    // fixed-point iteration in Long arithmetic
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.tail)
    }.toSeq
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val p6 = cnt.map { case ((f, t), c) => (f, t) -> c * 1000000L / tot(f) }
    val types = (cnt.keys.map(_._1) ++ cnt.keys.map(_._2)).toSet.toSeq.sorted
    var v: Map[String, Long] = types.map(_ -> 1000000L / types.size).toMap
    (1 to relational.Graph.MarkovIters).foreach { _ =>
      v = p6.groupBy(_._1._2).map { case (t, edges) =>
        t -> edges.map { case ((f, _), p) => v.getOrElse(f, 0L) * p / 1000000L }.sum
      }
    }
    assert(got == v, s"got $got want $v")
  }

  test("markov_stationary: planted 2-state chain converges to (1/3, 2/3)") {
    val tmp = java.nio.file.Files.createTempDirectory("graftmkv")
    // 100 two-event users: 50 A->B, 25 B->A, 25 B->B
    // => P(A->B)=1, P(B->A)=P(B->B)=1/2, stationary pi = (1/3, 2/3)
    val rows = (0 until 100).flatMap { u =>
      val (e1, e2) =
        if (u < 50) ("A", "B") else if (u < 75) ("B", "A") else ("B", "B")
      Seq(
        (u * 2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u.toLong, e1, 1.0),
        (u * 2L + 1, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), u.toLong, e2, 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = relational.Graph.markovStationary(spark, tmp.toString).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(got("A") - 1.0 / 3) < 1e-3, s"A: ${got("A")}")
    assert(math.abs(got("B") - 2.0 / 3) < 1e-3, s"B: ${got("B")}")
  }

  test("ts_autocorr == naive BigInt centered products, |acf| <= 1") {
    val rows = relational.TimeSeries.tsAutocorr(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag")).sorted.toSeq ==
      (1L to relational.TimeSeries.AcfMaxLag).toSeq)
    val daily = Tables.orders(spark, sf)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long")).as("cents"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        r.getAs[Long]("cents")).toMap
    val n = BigInt(daily.size)
    val tot = daily.values.map(BigInt(_)).sum
    val dev = daily.view.mapValues(c => n * c - tot).toMap
    val den = dev.values.map(d => d * d).sum
    for (r <- rows) {
      val k = r.getAs[Long]("lag")
      val pairs = dev.keys.filter(d => dev.contains(d - k)).toSeq
      assert(r.getAs[Long]("n_pairs") == pairs.length)
      val num = pairs.map(d => dev(d) * dev(d - k)).sum
      val want = BigDecimal(BigDecimal(num).toDouble / BigDecimal(den).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(r.getAs[Double]("acf") == want, s"lag $k: ${r.getAs[Double]("acf")} vs $want")
      assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-9)
    }
  }

  test("ts_autocorr: a planted period-2 series alternates sign by lag parity") {
    val tmp = java.nio.file.Files.createTempDirectory("graftacf")
    // 64 days strictly alternating $100/$300: acf is strongly negative
    // at odd lags and strongly positive at even lags
    val rows = (0 until 64).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 3, 1).plusDays(i).atStartOfDay()),
        if (i % 2 == 0) 100.0 else 300.0)
    }
    rows.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = relational.TimeSeries.tsAutocorr(spark, tmp.toString).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    (1L to relational.TimeSeries.AcfMaxLag).foreach { k =>
      if (k % 2 == 1) assert(got(k) < -0.75, s"odd lag $k: ${got(k)}")
      else assert(got(k) > 0.75, s"even lag $k: ${got(k)}")
    }
  }

  test("wavelet spectrum == naive BigInt Haar details; period-2 energy ranks level 1 first") {
    val rows = relational.TimeSeries.tsWaveletSpectrum(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("level")).sorted.toSeq ==
      (1L to relational.TimeSeries.WaveletLevels).toSeq)
    val daily = Tables.orders(spark, sf)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long")).as("cents"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        r.getAs[Long]("cents"))
    val minDay = daily.map(_._1).min
    val series = daily.map { case (d, c) => (d - minDay) -> c }.toMap
    for (r <- rows) {
      val l = r.getAs[Long]("level").toInt
      val (bs, hs) = (1L << l, 1L << (l - 1))
      val det = series.groupBy(_._1 / bs).map { case (_, blk) =>
        blk.map { case (i, c) => if ((i / hs) % 2 == 0) BigInt(c) else -BigInt(c) }.sum
      }
      assert(r.getAs[Long]("n_blocks") == det.size)
      assert(BigInt(r.getAs[String]("energy")) == det.map(d => d * d).sum,
        s"level $l energy mismatch")
    }
    // ranks are a permutation of 1..8
    assert(rows.map(_.getAs[Long]("energy_rank")).sorted.toSeq == (1L to 8L).toSeq)
    // planted alternating series: all variance lives at the finest scale
    val tmp = java.nio.file.Files.createTempDirectory("graftwav")
    (0 until 64).map { i =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(i)),
        if (i % 2 == 0) 100.0 else 300.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val planted = relational.TimeSeries.tsWaveletSpectrum(spark, tmp.toString)
      .collect().map(r => r.getAs[Long]("level") ->
        (r.getAs[String]("energy"), r.getAs[Long]("energy_rank"))).toMap
    // the $200 alternation: d = -+20000 cents per 2-day block, 32 blocks
    assert(BigInt(planted(1L)._1) == BigInt(32) * BigInt(20000) * BigInt(20000))
    // complete blocks at levels 2..6 see equal half-sums (the alternation
    // AND the series mean both cancel) -> exactly zero detail energy
    (2L to 6L).foreach(l => assert(BigInt(planted(l)._1) == 0, s"level $l"))
    // 64 days do NOT tile 128/256-day blocks: the zero-padded partial
    // blocks at levels 7-8 carry the raw series DC (sum = 32*(10000 +
    // 30000) cents), squared — the documented trend-at-the-top behavior
    val dc = BigInt(32) * BigInt(40000)
    assert(BigInt(planted(7L)._1) == dc * dc && BigInt(planted(8L)._1) == dc * dc)
    assert(planted(7L)._2 == 1L && planted(8L)._2 == 2L,
      s"DC ties rank by level: $planted")
    assert(planted(1L)._2 == 3L, "the alternation is the top NON-DC scale")
  }

  test("kcore: planted clique/cycle/path graph decomposes exactly; fixture reaches fixpoint") {
    // K5 on 1-5 (coreness 4), a 4-cycle on 10-13 (coreness 2), a path
    // 20-21-22 (coreness 1), and a pendant 6 hanging off the clique
    val clique = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val cyc = Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L))
    val path = Seq((20L, 21L), (21L, 22L))
    val pend = Seq((1L, 6L))
    val e = (clique ++ cyc ++ path ++ pend).toDF("a", "b")
    val got = relational.Graph.kcoreOfEdges(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (v <- 1L to 5L) assert(got(v)._2 == 4L, s"clique vertex $v: ${got(v)}")
    for (v <- 10L to 13L) assert(got(v)._2 == 2L, s"cycle vertex $v: ${got(v)}")
    for (v <- Seq(20L, 21L, 22L, 6L))
      assert(got(v)._2 == 1L, s"tree vertex $v: ${got(v)}")
    assert(got(1L)._1 == 5L) // 4 clique neighbors + the pendant
    assert(got(21L)._1 == 2L)

    // fixture: KcorePeelRounds suffices — one extra round of peeling
    // changes nothing (fixpoint), and coreness is consistent with a
    // driver-side peel to true fixpoint
    val fx = relational.Graph.kcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val edges = text.Dedup.jaccardPairs(spark, sf)
      .filter($"jacc" >= 0.5).select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def peel(k: Int, es: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      var cur = es
      var done = false
      while (!done) {
        val deg = (cur.map(_._1) ++ cur.map(_._2))
          .groupBy(identity).map { case (v, xs) => v -> xs.length }
        val next = cur.filter(p => deg(p._1) >= k && deg(p._2) >= k)
        done = next.length == cur.length
        cur = next
      }
      cur
    }
    var es: Seq[(Long, Long)] = edges
    val want = scala.collection.mutable.Map.empty[Long, Long]
    (edges.map(_._1) ++ edges.map(_._2)).distinct.foreach(want(_) = 1L)
    for (k <- 2 to relational.Graph.KcoreMax) {
      es = peel(k, es)
      (es.map(_._1) ++ es.map(_._2)).distinct.foreach(want(_) = k.toLong)
    }
    assert(fx == want.toMap, "fixture coreness != driver peel to fixpoint")
  }

  test("ts_ccf lag 0 == Pearson(rev, cnt); all lags naive-checked, |ccf| <= 1") {
    val rows = relational.TimeSeries.tsCcf(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.size == relational.TimeSeries.CcfMaxLag + 1)
    val daily = Tables.orders(spark, sf)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long")).as("cents"),
        count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1.toEpochDay)
    val byDay = daily.map(x => x._1.toEpochDay -> (x._2, x._3)).toMap
    for (lag <- 0L to relational.TimeSeries.CcfMaxLag.toLong) {
      val pts = byDay.keys.toSeq.flatMap { d0 =>
        byDay.get(d0 + lag).map(y => (byDay(d0)._1.toDouble, y._2.toDouble))
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val r = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (gotN, gotR) = rows(lag)
      assert(gotN == pts.length)
      assert(math.abs(gotR - r) < 1e-5, s"lag $lag: $gotR vs naive $r")
      assert(gotR >= -1.0 && gotR <= 1.0)
    }
  }

  test("ts_holt_forecast == driver recursion replay; constant series is flat") {
    val rows = relational.TimeSeries.tsHoltForecast(spark, sf).collect()
    assert(rows.length == relational.TimeSeries.HoltHorizon)
    val cents = Tables.orders(spark, sf)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100, 0).cast("long")).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val a = relational.TimeSeries.HoltAlpha
    val b = relational.TimeSeries.HoltBeta
    var l = cents.head.toDouble; var tr = 0.0
    for (x <- cents.tail) {
      val l2 = a * x + (1 - a) * (l + tr)
      tr = b * (l2 - l) + (1 - b) * tr
      l = l2
    }
    for (r <- rows) {
      val h = r.getAs[Long]("h")
      val want = BigDecimal(l + h * tr)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(r.getAs[Long]("forecast_cents") == want,
        s"h=$h: ${r.getAs[Long]("forecast_cents")} vs replay $want")
      assert(r.getAs[Long]("n_days") == cents.length)
    }
    // constant series: level == the constant, trend 0, forecasts flat
    val tmp = java.nio.file.Files.createTempDirectory("graftholt")
    (1 to 30).map(i => (i.toLong, 1L,
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
      500.00))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val flat = relational.TimeSeries.tsHoltForecast(spark, tmp.toString)
      .collect()
    for (r <- flat) {
      assert(r.getAs[Long]("forecast_cents") == 50000L)
      assert(r.getAs[Long]("trend_cents") == 0L)
    }
  }

  test("markov_entropy_rate: bounds, pi ties to stationary, uniform chain planted") {
    val rows = relational.Graph.markovEntropyRate(spark, sf).collect()
    val pi = relational.Graph.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
    val k = rows.length
    assert(k == pi.size)
    for (r <- rows) {
      val h = r.getAs[Double]("h_state")
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-9,
        s"${r.getString(0)}: h_state $h out of [0, ln k]")
      assert(r.getAs[Double]("pi") == pi(r.getString(0)))
      val w = r.getAs[Double]("h_weighted")
      assert(w >= 0.0 && w <= h + 1e-9)
    }
    // planted: uniform 2-state chain -> every h_state = ln 2, pi = 1/2,
    // rate = ln 2
    val tmp = java.nio.file.Files.createTempDirectory("graftent")
    val ts0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    // one timeline a,a,b,b,a,a,b,b,…: from each state the next step is
    // a 50/50 split (a→a, a→b, b→b, b→a all equally frequent)
    (0 until 401).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(ts0.plusMinutes(i)), 1L,
        if (i % 4 < 2) "a" else "b", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val u = relational.Graph.markovEntropyRate(spark, tmp.toString).collect()
    assert(u.length == 2)
    for (r <- u) {
      assert(math.abs(r.getAs[Double]("h_state") - math.log(2.0)) < 1e-3,
        s"planted h_state ${r.getAs[Double]("h_state")}")
      assert(math.abs(r.getAs[Double]("pi") - 0.5) < 1e-3)
    }
  }

  test("markov_prediction_accuracy: argmax cell, accuracy in (0,1]; deterministic chain -> 1") {
    val rows = relational.Graph.markovPredictionAccuracy(spark, sf).collect()
    // naive transition recount
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    for (r <- rows) {
      val from = r.getAs[String]("event_type")
      val outs = trans.filter(_._1._1 == from)
      val tot = outs.values.sum
      val best = outs.toSeq.sortBy { case ((_, t), c) => (-c, t) }.head
      assert(r.getAs[String]("predicted_next") == best._1._2)
      assert(r.getAs[Long]("n") == tot)
      assert(r.getAs[Long]("n_correct") == best._2)
      val acc = r.getAs[Double]("accuracy")
      assert(acc > 0.0 && acc <= 1.0)
    }
    // planted deterministic cycle a->b->a: accuracy exactly 1.0
    val tmp = java.nio.file.Files.createTempDirectory("graftpred")
    val ts0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    (0 until 100).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(ts0.plusMinutes(i)), 1L,
        if (i % 2 == 0) "a" else "b", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val det = relational.Graph.markovPredictionAccuracy(spark, tmp.toString)
      .collect()
    for (r <- det) assert(r.getAs[Double]("accuracy") == 1.0)
  }

  test("twap_user_value == naive step integral; bounded by min/max; constant flat") {
    val rows = relational.TimeSeries.twapUserValue(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"value").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.getEpochSecond * 1000000L +
          r.getTimestamp(1).toInstant.getNano / 1000L,
        r.getLong(2), math.round(r.getDouble(3) * 100)))
      .groupBy(_._1)
    for ((u, es) <- evs if es.map(_._2).distinct.length > 1) {
      val o = es.sortBy(e => (e._2, e._3))
      val wsum = o.zip(o.drop(1))
        .map { case (a, b) => BigInt(a._4) * BigInt(b._2 - a._2) }.sum
      val span = o.last._2 - o.head._2
      val want = (BigDecimal(wsum) / BigDecimal(span)).toDouble / 100.0
      val (n, twap) = rows(u)
      assert(n == es.length)
      assert(math.abs(twap - want) < 1e-6, s"user $u: $twap vs $want")
      val vs = o.map(_._4 / 100.0)
      assert(twap >= vs.min - 1e-9 && twap <= vs.max + 1e-9)
    }
    // constant value stream -> twap exactly the constant
    val tmp = java.nio.file.Files.createTempDirectory("grafttwap")
    val ts0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    (0 until 10).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(ts0.plusMinutes(i * i)), 1L, "click",
      42.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val c = relational.TimeSeries.twapUserValue(spark, tmp.toString)
      .collect()(0)
    assert(c.getDouble(2) == 42.5)
  }

  test("conversion_delay_quantiles == naive sorted order statistics") {
    val r = relational.TimeSeries.conversionDelayQuantiles(spark, sf)
      .collect()(0)
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(x => (x.getLong(0),
        x.getTimestamp(1).toInstant.getEpochSecond * 1000000L +
          x.getTimestamp(1).toInstant.getNano / 1000L,
        x.getLong(2), x.getString(3)))
      .groupBy(_._1)
    val delays = evs.values.toSeq.flatMap { es =>
      val o = es.sortBy(e => (e._2, e._3))
      var lastClick = Option.empty[Long]
      o.flatMap { e =>
        if (e._4 == "click") { lastClick = Some(e._2); None }
        else if (e._4 == "purchase") lastClick.map(c => (e._2 - c) / 1000000L)
        else None
      }
    }.sorted
    assert(r.getAs[Long]("n") == delays.length)
    assert(r.getAs[Long]("p50_s") == delays((delays.length - 1) / 2))
    assert(r.getAs[Long]("p90_s") == delays((delays.length - 1) * 9 / 10))
    assert(r.getAs[Long]("p99_s") == delays((delays.length - 1) * 99 / 100))
    assert(r.getAs[Long]("p50_s") <= r.getAs[Long]("p90_s"))
    assert(r.getAs[Long]("p90_s") <= r.getAs[Long]("p99_s"))
    val mean = delays.map(BigInt(_)).sum.toDouble / delays.length
    assert(math.abs(r.getAs[Double]("mean_s") - mean) < 1e-4)
  }

  test("event_corr_matrix == naive zero-filled recount; bounds and pair count") {
    val rows = relational.TimeSeries.eventCorrMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val evs = Tables.events(spark, sf)
      .select(to_date($"ts").cast("string"), $"event_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val days = evs.map(_._1).distinct.sorted
    val types = evs.map(_._2).distinct.sorted
    assert(rows.size == types.length * (types.length - 1) / 2)
    val cnt = evs.groupBy(identity).map { case (k, v) => k -> v.length.toDouble }
    for (i <- types.indices; j <- (i + 1) until types.length) {
      val (a, b) = (types(i), types(j))
      val xs = days.map(d => cnt.getOrElse((d, a), 0.0))
      val ys = days.map(d => cnt.getOrElse((d, b), 0.0))
      val n = days.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val want = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val key = if (a < b) (a, b) else (b, a)
      val (gn, gr) = rows(key)
      assert(gn == days.length)
      assert(math.abs(gr - want) < 1e-5, s"$key: $gr vs $want")
      assert(gr >= -1.0 && gr <= 1.0)
    }
  }

  test("events_arrival_profile == naive per-type gap order statistics") {
    val rows = relational.TimeSeries.eventArrivalProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toInstant.getEpochSecond * 1000000L +
          r.getTimestamp(2).toInstant.getNano / 1000L, r.getLong(3)))
    val gaps = evs.groupBy(e => (e._1, e._2)).values.toSeq.flatMap { es =>
      val o = es.sortBy(e => (e._3, e._4))
      o.zip(o.drop(1)).map { case (a, b) => (a._2, (b._3 - a._3) / 1000000L) }
    }.groupBy(_._1).map { case (t, gs) => t -> gs.map(_._2).sorted }
    assert(rows.keySet == gaps.keySet)
    for ((t, gs) <- gaps) {
      val (n, p50, p90, mean) = rows(t)
      assert(n == gs.length)
      assert(p50 == gs((gs.length - 1) / 2), s"$t median")
      assert(p90 == gs((gs.length - 1) * 9 / 10), s"$t p90")
      assert(math.abs(mean - gs.map(BigInt(_)).sum.toDouble / gs.length)
        < 1e-4)
    }
  }

  test("EWMA with one event equals that event's value") {
    val one = Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 42.5))
      .toDF("user_id", "ts", "value")
      .withColumn("event_id", lit(9L))
    // reuse the fold shape directly on a single-row frame
    val got = one.groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"value"))).as("evs"))
      .select(aggregate(
        expr("slice(evs, 2, size(evs) - 1)"),
        $"evs"(0)("value"),
        (acc, e) => acc * (1 - TimeSeries.Alpha) + e("value") * TimeSeries.Alpha))
      .first().getDouble(0)
    assert(got == 42.5)
  }
}
