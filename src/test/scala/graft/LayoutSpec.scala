package graft

import graft.relational.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: key correctness properties plus the effect the key
  * exists for — multi-dimensional row-group pruning.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave is a bijection on (16-bit, 16-bit) pairs") {
    val pairs = spark.range(512).select(
      (col("id") % 19 * 131 % 65536).as("a"), (col("id") % 23 * 947 % 65536).as("b"))
    val z = pairs.select(col("a"), col("b"), Layout.zInterleave16(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    z.foreach { case (a, b, zv) =>
      // decode even/odd bits back out; must round-trip
      var (da, db) = (0L, 0L)
      (0 until 16).foreach { i =>
        da |= ((zv >> (2 * i)) & 1L) << i
        db |= ((zv >> (2 * i + 1)) & 1L) << i
      }
      assert((da, db) === (a, b), s"z=$zv failed to round-trip ($a,$b)")
    }
  }

  test("zorderOrders masks both dims to 16 bits: out-of-range keys wrap, not corrupt") {
    // synthetic orders rows straddling 2^16 on custkey and pre-epoch on
    // date: the shipped key must equal the interleave of the MASKED
    // values (pinning the documented wrap semantics; an unmasked cast
    // would produce garbage bits above 2^16 / for negative datediff)
    val tmp = java.nio.file.Files.createTempDirectory("graftzo")
    Seq(
      (1L, 65536L + 5L, "1995-03-01"), // custkey wraps to 5
      (2L, 5L, "1995-03-01"), // in-range twin of row 1
      (3L, 7L, "1994-12-31") // pre-epoch: datediff -1 wraps to 65535
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val z = graft.relational.Layout.zorderOrders(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(z(1L) == z(2L), "custkey 65536+5 must alias custkey 5 (mask wrap)")
    val wantPreEpoch = Layout
      .zInterleave16(lit(7L), lit(65535L))
    val want = spark.range(1).select(wantPreEpoch.as("z")).head().getLong(0)
    assert(z(3L) == want, s"pre-epoch date must wrap to 65535: got ${z(3L)}, want $want")
  }

  test("Z-clustered parquet prunes row groups on the dimension a linear sort can't") {
    // sf0.01, not the usual sf0.001: row-group pruning only bites once
    // groups (>= ~100 rows, parquet's min-record check) are DENSER than
    // a day bucket — at 1500 rows every group spans all custkeys and
    // nothing can prune, which is itself the layout lesson this spec
    // teaches (clustering only pays above a density threshold)
    val base = Tables.orders(spark, "/root/testdata/sf0.01").withColumn("zval",
      Layout.zInterleave16(
        $"o_custkey".cast("long"),
        datediff(to_date($"o_orderdate"), lit("1995-01-01")).cast("long")))
    val dir = java.nio.file.Files.createTempDirectory("graftzorder")
    // tiny row groups so the 1500-row fixture produces many of them;
    // single file per layout so group count is the only variable
    def write(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val p = s"$dir/$name"
      df.coalesce(1).sortWithinPartitions("sortkey")
        .drop("sortkey")
        .write.option("parquet.block.size", "4096")
        .option("parquet.page.size", "2048")
        .mode("overwrite").parquet(p)
      p
    }
    val byDate = write(base.withColumn("sortkey", $"o_orderdate"), "by_date")
    val byZ = write(base.withColumn("sortkey", $"zval"), "by_z")

    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      // selective predicate on the dimension the date sort ignores
      def scanned(path: String): (Long, Long) = {
        val before = listener.snapshot
        val n = spark.read.parquet(path).filter($"o_custkey".between(10, 19)).count()
        org.apache.spark.graftbench.BusDrain.drain(spark.sparkContext)
        val d = listener.snapshot.zip(before).map { case (a, b) => a - b }
        (n, d(2)) // (result rows, inputRecords actually decoded)
      }
      val (nDate, recDate) = scanned(byDate)
      val (nZ, recZ) = scanned(byZ)
      assert(nDate === nZ, "layouts must not change query results")
      assert(nZ > 0)
      // the date-sorted file scatters custkey across every row group, so
      // min/max stats prune nothing; the Z layout clusters custkey and
      // skips groups — strictly fewer records decoded (deterministic
      // data and layout, so no flake margin is needed)
      assert(recZ < recDate,
        s"Z layout decoded $recZ records vs $recDate for the linear layout")
      info(s"row-group pruning: Z layout decoded $recZ of $recDate records " +
        f"(${recZ.toDouble / recDate}%.2f of the linear layout's scan)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("hilbert walk is a bijection on the 256x256 grid with UNIT-step locality") {
    import org.apache.spark.sql.functions._
    // exhaustive ground truth: every (x, y) once; d must cover 0..65535
    // exactly once AND consecutive d must be grid NEIGHBORS (|Δx|+|Δy|
    // = 1) — the locality property Z-order lacks (its diagonal jumps
    // are why a spatial range splits into more Z-ranges)
    val grid = spark.range(65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val walked = Layout.hilbertD(
      grid.selectExpr("x", "y", "x AS x0", "y AS y0"), Seq("x0", "y0"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("d")
    val steps = walked
      .select($"x0", $"y0", $"d",
        lag($"x0", 1).over(w).as("px"), lag($"y0", 1).over(w).as("py"),
        lag($"d", 1).over(w).as("pd"))
      .filter($"pd".isNotNull)
      .select(
        (abs($"x0" - $"px") + abs($"y0" - $"py")).as("manhattan"),
        ($"d" - $"pd").as("dstep"))
      .agg(
        count(lit(1)).as("n"),
        max($"manhattan").as("max_m"), min($"manhattan").as("min_m"),
        max($"dstep").as("max_d"), min($"dstep").as("min_d"))
      .head()
    assert(steps.getAs[Long]("n") == 65535L)
    assert(steps.getAs[Long]("min_m") == 1L && steps.getAs[Long]("max_m") == 1L,
      s"non-unit step: ${steps}")
    // d strictly increments by 1 ⇒ bijection onto 0..65535
    assert(steps.getAs[Long]("min_d") == 1L && steps.getAs[Long]("max_d") == 1L)
    assert(walked.agg(min($"d"), max($"d")).head() ===
      org.apache.spark.sql.Row(0L, 65535L))
  }

  test("compaction_plan == driver FFD replay; loads within cap; full cover") {
    val rows = relational.Layout.compactionPlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val sizes = Tables.orders(spark, sf)
      .groupBy(expr(
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)")
        .as("m"))
      .count().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == sizes.length)
    assert(rows.map(_._1).sorted.sameElements(sizes.map(_._1).sorted))
    val cap = rows.head._5
    assert(cap == math.max(sizes.map(_._2).max,
      (sizes.map(_._2).sum + 5) / 6))
    val byBin = rows.groupBy(_._3)
    for ((_, rs) <- byBin) {
      val load = rs.map(_._2).sum
      assert(load <= cap, s"bin overflow: $load > $cap")
      rs.foreach(r => assert(r._4 == load))
    }
    // driver FFD replay: identical assignment
    val items = sizes.sortBy(x => (-x._2, x._1))
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    val want = scala.collection.mutable.Map.empty[Long, Long]
    for ((m, s) <- items) {
      val idx = bins.indexWhere(_ + s <= cap)
      if (idx >= 0) { bins(idx) += s; want(m) = idx.toLong }
      else { bins += s; want(m) = (bins.length - 1).toLong }
    }
    for (r <- rows) assert(r._3 == want(r._1),
      s"month ${r._1}: bin ${r._3} vs replay ${want(r._1)}")
  }

  test("abc_classification: partition thresholds honored; planted dominance") {
    val rows = relational.Analytics.abcClassification(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val total = rows.map(_._2).sum
    val aRev = rows.filter(_._3 == "A").map(_._2).sum
    val abRev = rows.filter(r => r._3 == "A" || r._3 == "B").map(_._2).sum
    // inclusive-block classification: A stops at <= 80%; the next value
    // block would cross it (same for B at 95)
    assert(aRev / total <= 0.8 + 1e-9)
    val bVals = rows.filter(_._3 == "B").map(_._2)
    if (bVals.nonEmpty) assert((aRev + bVals.max) / total > 0.8 - 1e-9)
    assert(abRev / total <= 0.95 + 1e-9)
    // equal revenue -> equal class
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).distinct.length == 1)
    }
    // planted: one whale owns 79% -> it alone is A
    val tmp = java.nio.file.Files.createTempDirectory("graftabc")
    ((1 to 21).map(i => (i.toLong, i.toLong,
      java.sql.Date.valueOf("2024-01-01"), 10.00)) :+
      ((100L, 100L, java.sql.Date.valueOf("2024-01-01"), 790.00)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val p = relational.Analytics.abcClassification(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(p(100L) == "A")
    assert(p.count(_._2 == "A") == 1)
  }
}
