package graft

import java.sql.Timestamp

/** Specs for [[relational.StatModels]]: OLS against a naive driver
  * recomputation, KL non-negativity, MAD against an all-integer brute
  * force.
  */
class StatModelsSpec extends SparkSpec {
  import spark.implicits._

  test("ols_price_trend matches a naive driver-side least squares") {
    val rows = relational.StatModels.olsPriceTrend(spark, sf).collect()
    assert(rows.nonEmpty)
    val obs = Tables.orders(spark, sf)
      .select($"o_orderpriority",
        org.apache.spark.sql.functions.datediff(
          $"o_orderdate".cast("date"),
          org.apache.spark.sql.functions.lit("1970-01-01").cast("date"))
          .cast("double"),
        org.apache.spark.sql.functions
          .round($"o_totalprice" * 100, 0))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    for (r <- rows) {
      val pts = obs(r.getAs[String]("priority"))
      val n = pts.length.toDouble
      val sx = pts.map(_._2).sum
      val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      assert(r.getAs[Long]("n") == pts.length)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-3,
        s"slope ${r.getAs[Double]("slope")} vs naive $slope")
      assert(math.abs(r.getAs[Double]("intercept") - icept) < 1.0,
        s"intercept ${r.getAs[Double]("intercept")} vs naive $icept")
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("zipf_fit: bounded head, descending law direction") {
    val r = relational.StatModels.zipfFit(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val vocab = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        text.TextAnalysis.toks($"text")).as("t"))
      .select($"t").distinct().count()
    assert(row.getAs[Long]("n_tokens") ==
      math.min(vocab, relational.StatModels.ZipfTop))
    // frequency falls with rank, so the log-log slope and corr are
    // negative on any corpus with frequency variation
    assert(row.getAs[Double]("slope") < 0.0)
    val c = row.getAs[Double]("corr")
    assert(c >= -1.0 && c < 0.0)
  }

  test("customer_rfm: tertile scores populated and consistent with the string") {
    val rows = relational.StatModels.customerRfm(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.length == nCust)
    for (dim <- Seq("r_score", "f_score", "m_score")) {
      val counts = rows.groupBy(_.getAs[Long](dim)).view.mapValues(_.size).toMap
      assert(counts.keySet.subsetOf(Set(1L, 2L, 3L)), s"$dim out of range")
      // tertile banding: every class exists and none swallows the table
      for (s <- Seq(1L, 2L, 3L)) {
        val frac = counts.getOrElse(s, 0).toDouble / rows.length
        assert(frac > 0.05 && frac < 0.7, s"$dim=$s fraction $frac degenerate")
      }
    }
    for (r <- rows)
      assert(r.getAs[String]("rfm") ==
        s"${r.getAs[Long]("r_score")}${r.getAs[Long]("f_score")}${r.getAs[Long]("m_score")}")
  }

  test("revenue_concentration: HHI within bounds and equal to a naive fold") {
    val r = relational.StatModels.revenueConcentration(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_suppliers")
    val hhi = r.getAs[Double]("hhi")
    val top = r.getAs[Double]("top10_share")
    assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0)
    assert(top > 0.0 && top <= 1.0)
    // naive recomputation from the raw cent sums
    val cents = Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(
          $"l_extendedprice" * (org.apache.spark.sql.functions.lit(1) - $"l_discount") * 100, 0)
          .cast("long")).as("c"))
      .collect().map(_.getAs[Long]("c"))
    val tot = cents.map(BigInt(_)).sum.toDouble
    val naiveHhi = cents.map(c => (c.toDouble / tot) * (c.toDouble / tot)).sum
    assert(math.abs(hhi - naiveHhi) < 1e-6, s"hhi $hhi vs naive $naiveHhi")
    val naiveTop = cents.sorted.reverse.take(
      relational.StatModels.TopShare).map(_.toDouble).sum / tot
    assert(math.abs(top - naiveTop) < 1e-6)
  }

  test("anomaly_mad == brute-force sorted median/MAD on the fixture") {
    val got = relational.StatModels.anomalyMad(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val raw = Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => r.getString(0) -> math.round(r.getDouble(1) * 100))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted.toVector }
    // all-integer brute force in the operator's own 2x/4x units
    def med2Of(v: Vector[Long]): Long = v((v.length - 1) / 2) + v(v.length / 2)
    raw.foreach { case (t, v) =>
      val (n, m, mad, nOut) = got(t)
      assert(n == v.length)
      val med2 = med2Of(v)
      assert(m == med2.toDouble / 200, s"$t median: got $m")
      val d2 = v.map(c => math.abs(2 * c - med2)).sorted
      val mad4 = med2Of(d2)
      assert(mad == mad4.toDouble / 400, s"$t mad: got $mad")
      val outWant = d2.count(x => 2 * x > 3 * mad4)
      assert(nOut == outWant, s"$t outliers: got $nOut want $outWant")
    }
  }

  test("anomaly_mad: ties and even/odd group sizes localize exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graftmad")
    // group a (odd, ties at the median), group b (even, interpolated)
    val rows = Seq(
      (1L, "a", 1.00), (2L, "a", 2.00), (3L, "a", 2.00), (4L, "a", 2.00),
      (5L, "a", 90.00),
      (6L, "b", 1.00), (7L, "b", 2.00), (8L, "b", 3.00), (9L, "b", 50.00))
    rows.map { case (id, t, v) =>
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), id, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = relational.StatModels.anomalyMad(spark, tmp.toString).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    // a: median 2.00, devs (1,0,0,0,88) -> MAD 0, outliers = any dev>0 = 2
    assert(got("a") == (5L, 2.00, 0.00, 2L))
    // b: median 2.50, devs (1.5,0.5,0.5,47.5) -> sorted (0.5,0.5,1.5,47.5)
    //    MAD = (0.5+1.5)/2 = 1.0, outliers: dev > 3.0 -> only 47.5
    assert(got("b") == (4L, 2.50, 1.00, 1L))
  }

  test("theilsen_trend == naive BigInt pairwise-slope median") {
    val r = relational.StatModels.theilsenTrend(spark, sf).collect()(0)
    val daily = Tables.orders(spark, sf)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round($"o_totalprice" * 100, 0)
          .cast("long")).as("cents"))
      .collect()
      .map(row => (row.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        row.getAs[Long]("cents")))
      .sortBy(_._1)
    def fdiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a % b != 0 && ((a < 0) != (b < 0))) q - 1 else q
    }
    def med2Of(v: Seq[BigInt]): BigInt = {
      val s = v.sorted
      s((s.length - 1) / 2) + s(s.length / 2)
    }
    val slopes = for {
      i <- daily.indices; j <- 0 until i
    } yield fdiv(BigInt(daily(i)._2 - daily(j)._2) * 1000000,
      BigInt(daily(i)._1 - daily(j)._1))
    val slopeMed2 = med2Of(slopes)
    assert(r.getAs[Long]("n_days") == daily.length)
    assert(r.getAs[Long]("n_pairs") == slopes.length)
    assert(r.getAs[Double]("slope") == slopeMed2.toDouble / 2000000.0)
    val resid = daily.map { case (x, y) =>
      BigInt(y) * 2000000 - slopeMed2 * BigInt(x)
    }
    assert(r.getAs[Double]("intercept_cents") ==
      med2Of(resid).toDouble / 4000000.0)
  }

  test("theilsen_trend: planted linear trend survives a wild outlier day") {
    val tmp = java.nio.file.Files.createTempDirectory("graftts")
    // y = 1000 + 7 cents/day on 31 days, one day blasted 100x: OLS
    // slope would move by ~2 cents/day; the slope median must not
    val rows = (0 until 31).map { i =>
      val day = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      val cents = if (i == 15) 10000000L else 100000L + 7L * i
      (i.toLong, 1L, "O", cents / 100.0, day, "1-URGENT", "c", 0L, "x")
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority", "o_comment")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = relational.StatModels.theilsenTrend(spark, tmp.toString).collect()(0)
    assert(r.getAs[Long]("n_days") == 31)
    assert(r.getAs[Long]("n_pairs") == 31L * 30 / 2)
    assert(r.getAs[Double]("slope") == 7.0,
      s"slope ${r.getAs[Double]("slope")} dragged off the planted 7 cents/day")
  }

  test("bootstrap_ci == driver md5 replay; CI brackets the point estimate") {
    val r = relational.StatModels.bootstrapCi(spark, sf).collect()(0)
    val B = relational.StatModels.BootB
    assert(r.getAs[Long]("n_resamples") == B)
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey",
        org.apache.spark.sql.functions.round($"o_totalprice" * 100, 0)
          .cast("long"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    // exact replay of the hash-Poisson draw: md5(key ':' b/4), the
    // 32 hex chars split into four 8-char lanes, lane b%4 over 2^32
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(key: Long, b: Int): Double = {
      val hex = md.digest(s"$key:${b / 4}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val lane = hex.substring(8 * (b % 4), 8 * (b % 4) + 8)
      java.lang.Long.parseLong(lane, 16).toDouble / 4294967296e0
    }
    val e1 = math.exp(-1.0)
    val thr = {
      var t = 1.0; var c = 0.0
      (0 to 5).map { k => if (k > 0) t /= k; c += t; c * e1 }
    }
    def mult(uu: Double): Long =
      thr.indexWhere(uu < _) match { case -1 => 6L; case k => k.toLong }
    val means = (0 until B).map { b =>
      var wc = 0L; var wn = 0L
      orders.foreach { case (k, c) =>
        val m = mult(u(k, b)); wc += m * c; wn += m
      }
      (b, wc.toDouble / wn.toDouble)
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lo = r4(sorted((B - 1) * 25 / 1000))
    val hi = r4(sorted((B - 1) * 975 / 1000))
    assert(r.getAs[Double]("ci_lo_cents") == lo,
      s"lo ${r.getAs[Double]("ci_lo_cents")} vs replay $lo")
    assert(r.getAs[Double]("ci_hi_cents") == hi)
    val mean = r.getAs[Double]("mean_cents")
    assert(lo < mean && mean < hi, s"CI [$lo,$hi] must bracket $mean")
    assert(r.getAs[Long]("n_orders") == orders.length)
  }

  test("revenue_gini == naive sorted-rank formula; planted extremes hit 0 and (n-1)/n") {
    val r = relational.StatModels.revenueGini(spark, sf).collect()(0)
    val cents = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round($"o_totalprice" * 100, 0)
          .cast("long")).as("c"))
      .collect().map(_.getAs[Long]("c")).sorted
    val n = cents.length
    val tot = cents.map(BigInt(_)).sum
    val rw = cents.zipWithIndex.map { case (c, i) => BigInt(c) * (i + 1) }.sum
    val want = BigDecimal(
      2.0 * rw.toDouble / (n.toDouble * tot.toDouble) - (n + 1.0) / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Double]("gini") == want,
      s"gini ${r.getAs[Double]("gini")} vs naive $want")
    assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
    // planted: perfectly equal customers -> gini 0
    val tmp = java.nio.file.Files.createTempDirectory("graftgini")
    (1 to 40).map(i => (i.toLong, i.toLong,
      java.sql.Date.valueOf("2024-01-01"), 250.00))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val eq = relational.StatModels.revenueGini(spark, tmp.toString).collect()(0)
    assert(eq.getAs[Double]("gini") == 0.0)
    // planted: one customer owns everything measurable -> near (n-1)/n
    (1 to 40).map(i => (i.toLong, i.toLong,
      java.sql.Date.valueOf("2024-01-01"), if (i == 40) 1000000.00 else 0.01))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val one = relational.StatModels.revenueGini(spark, tmp.toString).collect()(0)
    assert(one.getAs[Double]("gini") > 0.97, s"got ${one.getAs[Double]("gini")}")
  }

  test("source_js_divergence == naive driver JSD; bounded by ln 2") {
    val rows = relational.StatModels.sourceJs(spark, sf).collect()
    val toks = Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val bySrc = toks.groupBy(_._1).map { case (s, ts) =>
      s -> ts.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    }
    val corpus = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val cTot = toks.length.toDouble
    assert(rows.length == bySrc.size)
    for (r <- rows) {
      val src = r.getAs[String]("source")
      val cs = bySrc(src).values.sum.toDouble
      // full-vocabulary naive JSD (no complement-mass shortcut)
      val jsd = corpus.map { case (t, ct) =>
        val p = bySrc(src).getOrElse(t, 0L) / cs
        val q = ct / cTot
        val m = (p + q) / 2.0
        (if (p > 0) p * math.log(p / m) else 0.0) +
          q * math.log(q / m)
      }.sum / 2.0
      val got = r.getAs[Double]("jsd")
      assert(math.abs(got - jsd) < 1e-5, s"$src: $got vs naive $jsd")
      assert(got >= 0.0 && got <= 0.6931472, s"$src out of [0, ln2]: $got")
      assert(r.getAs[Long]("n_types") == bySrc(src).size)
    }
  }

  test("ks_value_drift == naive driver KS on collected values") {
    val r = relational.StatModels.ksValueDrift(spark, sf).collect()(0)
    val vals = Tables.events(spark, sf)
      .filter($"event_type" === "click" || $"event_type" === "purchase")
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "purchase").map(_._2).sorted
    assert(r.getAs[Long]("n_click") == a.length)
    assert(r.getAs[Long]("n_purchase") == b.length)
    val grid = (a ++ b).distinct.sorted
    val dNaive = grid.map { c =>
      math.abs(a.count(_ <= c).toDouble / a.length -
        b.count(_ <= c).toDouble / b.length)
    }.max
    assert(math.abs(r.getAs[Double]("d_stat") - dNaive) < 1e-6,
      s"D ${r.getAs[Double]("d_stat")} vs naive $dNaive")
    val p = r.getAs[Double]("p_value")
    assert(p >= 0.0 && p <= 1.0, s"p out of range: $p")
    // same distribution against itself -> D = 0 exactly
    val tmp = java.nio.file.Files.createTempDirectory("graftks")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (1 to 50).flatMap(i => Seq(
      (i.toLong * 2, ts0, i.toLong, "click", i * 1.25, "{}"),
      (i.toLong * 2 + 1, ts0, i.toLong, "purchase", i * 1.25, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val same = relational.StatModels.ksValueDrift(spark, tmp.toString)
      .collect()(0)
    // exactly +0.0 — the NegZero discipline at the leaf
    assert(java.lang.Double.doubleToRawLongBits(
      same.getAs[Double]("d_stat")) == 0L)
    // identical distributions: the truncated Smirnov series evaluates
    // to 2.0 at lambda=0; the clamp must report exactly p = 1.0
    assert(same.getAs[Double]("p_value") == 1.0,
      s"no-drift p_value must be 1.0, got ${same.getAs[Double]("p_value")}")
  }

  test("spearman_doc_signals == naive midrank correlation; planted monotone -> 1") {
    val r = relational.StatModels.spearmanDocSignals(spark, sf).collect()(0)
    val pts = Tables.documents(spark, sf)
      .select($"n_chars",
        org.apache.spark.sql.functions.size(text.TextAnalysis.toks($"text"))
          .cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def midranks(vs: Seq[Long]): Map[Long, Double] =
      vs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
    val mx = midranks(pts.map(_._1)); val my = midranks(pts.map(_._2))
    val rp = pts.map(p => (mx(p._1), my(p._2)))
    val n = rp.length.toDouble
    val su = rp.map(_._1).sum; val sv = rp.map(_._2).sum
    val suv = rp.map(p => p._1 * p._2).sum
    val suu = rp.map(p => p._1 * p._1).sum
    val svv = rp.map(p => p._2 * p._2).sum
    val want = (n * suv - su * sv) /
      math.sqrt((n * suu - su * su) * (n * svv - sv * sv))
    assert(r.getAs[Long]("n") == pts.length)
    assert(math.abs(r.getAs[Double]("rho") - want) < 1e-5,
      s"rho ${r.getAs[Double]("rho")} vs naive $want")
    // chars and token count should co-rank strongly on natural text
    assert(r.getAs[Double]("rho") > 0.5)

    // planted: y a strictly monotone function of x (distinct) -> rho = 1
    val tmp = java.nio.file.Files.createTempDirectory("graftsp")
    (1 to 100).map(i =>
      (i.toLong, ("w " * i).trim, "en", "s", i.toLong * 7 + 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val mono = relational.StatModels.spearmanDocSignals(spark, tmp.toString)
      .collect()(0)
    assert(mono.getAs[Double]("rho") == 1.0)
  }

  test("robust_trimmed_mean == naive sorted trim/winsorize; outlier robustness") {
    val rows = relational.StatModels.robustTrimmedMean(spark, sf).collect()
    val byType = Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    for (r <- rows) {
      val vs = byType(r.getAs[String]("event_type")).map(_._2).sorted
      val n = vs.length
      val lo = n / 20; val hi = n - n / 20
      val kept = vs.slice(lo, hi)
      val trimmed = kept.sum.toDouble / kept.length / 100.0
      val win = (kept.sum + lo.toLong * vs(lo) +
        (n - hi).toLong * vs(hi - 1)).toDouble / n / 100.0
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("trimmed_mean") - trimmed) < 1e-9,
        s"${r.getAs[String]("event_type")}: trimmed")
      assert(math.abs(r.getAs[Double]("winsorized_mean") - win) < 1e-9,
        s"${r.getAs[String]("event_type")}: winsorized")
    }
    // planted: one wild outlier drags the mean but not the trimmed mean
    val tmp = java.nio.file.Files.createTempDirectory("grafttrim")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    ((1 to 99).map(i => (i.toLong, ts0, 1L, "click", 10.0, "{}")) :+
      ((100L, ts0, 1L, "click", 1000000.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val t = relational.StatModels.robustTrimmedMean(spark, tmp.toString)
      .collect()(0)
    assert(t.getAs[Double]("trimmed_mean") == 10.0)
    assert(t.getAs[Double]("winsorized_mean") < 100.0)
  }

  test("mannwhitney_value_drift == naive rank-sum; planted shift moves z") {
    val r = relational.StatModels.mannWhitney(spark, sf).collect()(0)
    val vals = Tables.events(spark, sf)
      .filter($"event_type" === "click" || $"event_type" === "purchase")
      .select($"event_type", $"value").collect()
      .map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
    val pooled = vals.map(_._2)
    val mr = pooled.sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
    val n1 = vals.count(_._1 == "click"); val n2 = vals.length - n1
    val r1 = vals.filter(_._1 == "click").map(x => mr(x._2)).sum
    val u = r1 - n1.toDouble * (n1 + 1) / 2.0
    assert(r.getAs[Long]("n_click") == n1)
    assert(math.abs(r.getAs[Double]("u") - u) < 1e-6,
      s"U ${r.getAs[Double]("u")} vs naive $u")
    assert(r.getAs[Double]("mu") == n1.toDouble * n2 / 2.0)
    // tie-corrected z against the naive variance formula
    val nn = (n1 + n2).toDouble
    val ties = pooled.groupBy(identity).values
      .map(g => math.pow(g.length, 3) - g.length).sum
    val sig2 = (n1.toDouble * n2 / 12.0) *
      ((nn + 1) - ties / (nn * (nn - 1)))
    val z = (u - n1.toDouble * n2 / 2.0) / math.sqrt(sig2)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5,
      s"z ${r.getAs[Double]("z")} vs naive $z")
    // planted: purchase values uniformly above click -> U = 0, z << 0
    val tmp = java.nio.file.Files.createTempDirectory("graftmw")
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    ((1 to 50).map(i => (i.toLong, ts0, 1L, "click", i * 1.0, "{}")) ++
      (1 to 50).map(i => (100L + i, ts0, 1L, "purchase", 1000.0 + i, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val sh = relational.StatModels.mannWhitney(spark, tmp.toString).collect()(0)
    assert(sh.getAs[Double]("u") == 0.0)
    assert(sh.getAs[Double]("z") < -8.0, s"z ${sh.getAs[Double]("z")}")
  }

  test("vocab_chao1 == naive freq-of-freq; planted singleton/double extremes") {
    val r = relational.StatModels.vocabChao1(spark, sf).collect()(0)
    val toks = Tables.documents(spark, sf).select($"text").collect()
      .flatMap(_.getString(0).split("\\s+").filter(_.nonEmpty))
    val freq = toks.groupBy(identity).map(_._2.length)
    val v = freq.size; val f1 = freq.count(_ == 1); val f2 = freq.count(_ == 2)
    assert(r.getAs[Long]("v_seen") == v)
    assert(r.getAs[Long]("n_tokens") == toks.length)
    assert(r.getAs[Long]("f1") == f1 && r.getAs[Long]("f2") == f2)
    val chao = v + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))
    assert(math.abs(r.getAs[Double]("chao1") - chao) < 1e-5)
    assert(r.getAs[Double]("chao1") >= v) // estimate never below observed
    // planted: every token seen exactly twice -> F1 = 0 -> chao1 = V
    val tmp = java.nio.file.Files.createTempDirectory("graftchao")
    (1 to 10).map(i => (i.toLong, s"tok$i tok$i", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val p = relational.StatModels.vocabChao1(spark, tmp.toString).collect()(0)
    assert(p.getAs[Double]("chao1") == 10.0)
    assert(p.getAs[Double]("p_unseen") == 0.0)
  }

  test("source_heaps_law == naive recount; exponent in (0, 1] on natural text") {
    val rows = relational.StatModels.sourceHeapsLaw(spark, sf).collect()
    val st = Tables.documents(spark, sf).select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
      .groupBy(_._1)
    assert(rows.length == st.size)
    for (r <- rows) {
      val ts = st(r.getString(0))
      assert(r.getAs[Long]("v") == ts.map(_._2).distinct.length)
      assert(r.getAs[Long]("n") == ts.length)
      val c = r.getAs[Double]("heaps_c")
      assert(math.abs(c - math.log(r.getAs[Long]("v").toDouble) /
        math.log(r.getAs[Long]("n").toDouble)) < 1e-5)
      assert(c > 0.0 && c <= 1.0)
    }
  }

  test("hill_tail_index == naive top-k replay; alpha positive") {
    val r = relational.StatModels.hillTailIndex(spark, sf).collect()(0)
    val cents = Tables.orders(spark, sf).select($"o_totalprice").collect()
      .map(x => math.round(x.getDouble(0) * 100)).sorted(Ordering[Long].reverse)
    val k = relational.StatModels.HillK
    val top = cents.take(k + 1)
    val xk = top.last
    assert(r.getAs[Long]("k") == k)
    assert(r.getAs[Long]("x_kplus1_cents") == xk)
    val ls = top.map(c => math.log(c.toDouble / xk)).sum
    assert(math.abs(r.getAs[Double]("inv_alpha") - ls / k) < 1e-5)
    assert(r.getAs[Double]("alpha") > 0.0)
  }

  test("source_kl_divergence: KL >= 0 per source, all sources present") {
    val rows = relational.StatModels.sourceKl(spark, sf).collect()
    val nSources = Tables.documents(spark, sf)
      .select($"source").distinct().count()
    assert(rows.length == nSources)
    for (r <- rows) {
      assert(r.getAs[Double]("kl") >= 0.0,
        s"negative KL for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("n_types") > 0)
    }
  }
}
