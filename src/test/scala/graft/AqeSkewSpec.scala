package graft

import org.apache.spark.sql.functions._

/** Pins the AQE skew-join receipt machinery (AqeSkewRehearsal): the
  * skewMetric detector must read real OptimizeSkewedJoin firings from a
  * final adaptive plan, report zero on un-skewed plans, and the split
  * join must return exactly the unsplit result. The fixture corpus
  * cannot host the REAL-query firing test — sf0.001's orders parquet is
  * one row group, so the join exchange has one map task and AQE has no
  * mapper boundary to split at — hence the synthesized multi-partition
  * fact here; BENCH_aqeskew.json is the real-query assertion at 100×
  * (where the scan has hundreds of map tasks) with production
  * thresholds.
  */
class AqeSkewSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 8 map partitions, 70% of rows on one hot key — the
    * skewSaltedJoin scenario shrunk to fixture scale but with the
    * map-side parallelism AQE's splitter needs.
    */
  private def hotJoin = {
    import spark.implicits._
    val fact = spark.range(0, 200000, 1, 8).select(
      when($"id" % 10 < 7, lit(0L)).otherwise($"id" % 1000).as("k"),
      lit(1L).as("v"))
    val dim = spark.range(0, 1000, 1, 4)
      .select($"id".as("k2"), ($"id" % 5).as("seg")).hint("merge")
    fact.join(dim, $"k" === $"k2")
      .groupBy($"seg")
      .agg(count(lit(1)).as("n"), sum($"v").as("vsum"))
  }

  test("OptimizeSkewedJoin fires on a hot-key join and result equals the unsplit run") {
    import spark.implicits._
    def collectRows() = hotJoin.orderBy($"seg")
      .as[(Long, Long, Long)].collect().toSeq

    val unsplit = withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(collectRows())

    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {

      // probe the plan of the EXACT Dataset collected: orderBy AND
      // as[...] each return a new Dataset with a fresh QueryExecution,
      // and a never-run adaptive plan reads all-zero metrics
      // (isFinalPlan=false)
      val ds = hotJoin.orderBy($"seg").as[(Long, Long, Long)]
      val rows = ds.collect().toSeq
      val plan = ds.queryExecution.executedPlan

      val parts = AqeSkewRehearsal.skewMetric(plan, "numSkewedPartitions")
      val splits = AqeSkewRehearsal.skewMetric(plan, "numSkewedSplits")
      assert(parts > 0, s"no skewed partition detected:\n$plan")
      assert(splits > 0, s"skewed partition detected but not split:\n$plan")
      assert(plan.toString.contains("skew=true"),
        s"final plan carries no skew=true join node:\n$plan")
      assert(rows == unsplit,
        s"skew-split run diverged from the unsplit run:\n  split=$rows\n  unsplit=$unsplit")
    }
  }

  test("unsalted hot join equals the salted twin on the fixture corpus") {
    import spark.implicits._
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val aqe = AqeSkewRehearsal.unsaltedHotJoin(spark, sf)
        .orderBy($"c_mktsegment").as[(String, Long, Long)].collect().toSeq
      val salted = relational.Skew.skewSaltedJoin(spark, sf)
        .select($"c_mktsegment", $"n",
          round(col("sum_price") * 100).cast("long").as("cents_sum"))
        .orderBy($"c_mktsegment").as[(String, Long, Long)].collect().toSeq
      assert(aqe == salted)
    }
  }

  test("skew metrics read zero on an un-skewed plan (no false positives)") {
    val df = spark.range(1000).toDF("id")
      .groupBy("id").count()
    df.collect()
    assert(AqeSkewRehearsal.skewMetric(
      df.queryExecution.executedPlan, "numSkewedPartitions") == 0L)
  }
}
