package graft

import graft.apps.MrApps
import graft.mr.{KeyValue, MapReduce}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Proves the generic MapReduce core (graft.mr.MapReduce) computes the
  * same results as the declarative DataFrame pipelines, mirroring the
  * reference's distributed-vs-sequential-oracle test (tests/test-mr.sh).
  */
class MrCoreSpec extends SparkSpec {
  import spark.implicits._

  private def docsInput =
    Tables.documents(spark, sf).select("source", "text").as[(String, String)]

  private def viaCore(
      mapFn: (String, String) => IterableOnce[KeyValue],
      reduceFn: (String, Seq[String]) => String): Map[String, String] =
    MapReduce.run(spark, docsInput, mapFn, reduceFn, 8)
      .collect().map(kv => kv.key -> kv.value).toMap

  test("wc via generic core == declarative pipeline") {
    val core = viaCore(MrApps.wcMap, MrApps.wcReduce)
    val df = MrApps.wc(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toString).toMap
    assert(core === df)
  }

  test("early_exit via generic core == declarative pipeline") {
    // early_exit maps per file; feed one row per (source, concatenated text)
    val perFile = Tables.documents(spark, sf)
      .groupBy("source").count()
      .select($"source", $"count".cast("string")).as[(String, String)]
    // map emits (source, "1") once per doc -> emulate by exploding counts
    val core = MapReduce.run(
      spark,
      docsInput,
      MrApps.earlyExitMap,
      MrApps.earlyExitReduce,
      4).collect().map(kv => kv.key -> kv.value).toMap
    val df = MrApps.earlyExit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toString).toMap
    assert(core === df)
    assert(perFile.count() === df.size)
  }

  test("crash(nocrash) via generic core == declarative pipeline") {
    val perDoc = Tables.documents(spark, sf)
      .selectExpr("source", "cast(n_chars as string)").as[(String, String)]
    // crashMap uses (name=source, contents) but derives 'c' from contents
    // length; feed n_chars as a fake contents of the right length is
    // wasteful — instead map directly:
    val mapFn: (String, String) => IterableOnce[KeyValue] = (name, nChars) =>
      Seq(
        KeyValue("a", name),
        KeyValue("b", name.length.toString),
        KeyValue("c", nChars),
        KeyValue("d", "xyzzy"))
    val core = MapReduce.run(spark, perDoc, mapFn, MrApps.crashReduce, 4)
      .collect().map(kv => kv.key -> kv.value).toMap
    val df = MrApps.crashPipeline(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(core === df)
  }

  test("output is key-sorted within partitions (reference mr-out contract)") {
    val parts = MapReduce.run(spark, docsInput, MrApps.wcMap, MrApps.wcReduce, 4)
      .mapPartitions(it => Iterator.single(it.map(_.key).toSeq))
      .collect()
    parts.foreach(keys => assert(keys == keys.sorted))
  }

  test("runAgg (incremental Aggregator) == wc") {
    val countAgg: Aggregator[KeyValue, Long, Long] = new Aggregator[KeyValue, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: KeyValue): Long = b + 1
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    val agg = MapReduce.runAgg(spark, docsInput, MrApps.wcMap, countAgg)
      .collect().toMap
    val df = MrApps.wc(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg === df)
  }

  test("local[1] sequential == local[4] parallel (test-mr.sh analog)") {
    // Same session; the sequential oracle is the same job at nReduce=1.
    val one = MapReduce.run(spark, docsInput, MrApps.wcMap, MrApps.wcReduce, 1)
      .collect().map(kv => kv.key -> kv.value).toMap
    val par = MapReduce.run(spark, docsInput, MrApps.wcMap, MrApps.wcReduce, 8)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(one === par)
  }
}
