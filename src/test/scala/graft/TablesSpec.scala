package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Fixture-encoding robustness (VERDICT r7 item 5): the driver has
  * changed the on-disk `ts` encoding of events.parquet between rounds
  * (TIMESTAMP(NANOS) read as LONG under the nanosAsLong conf at r6,
  * then plain timestamp[us] with isAdjustedToUTC=false → TIMESTAMP_NTZ
  * at r7), and the r7 break was SILENT: the two ts-consuming queries
  * just vanished from CORRECTNESS_r07. This spec stages the events
  * table in every encoding Spark can produce and asserts the whole
  * ts-consuming path — Tables.events normalization AND the two queries
  * that broke — analyzes and agrees bit-for-bit across encodings, so
  * the next fixture change is loud.
  *
  * Note: Spark cannot WRITE parquet TIMESTAMP(NANOS); what the
  * nanosAsLong session surfaces from such a file is a LongType nano
  * column, so an int64 nanos file is byte-equivalent from
  * `Tables.normalizeTs`'s point of view and is what we stage here.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  /** Stage a full table directory: symlink every non-events table from
    * the sf0.001 fixture, write events with the given encoder.
    */
  private def stage(name: String)(writeEvents: (DataFrame, String) => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graftenc_$name").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"$sf/$t.parquet"))
    writeEvents(Tables.events(spark, sf), s"$dir/events.parquet")
    dir
  }

  private lazy val encodings: Map[String, String] = Map(
    // legacy: int64 nanos (what spark.sql.legacy.parquet.nanosAsLong
    // surfaces from a TIMESTAMP(NANOS) file)
    "nanos_long" -> stage("nanoslong") { (ev, path) =>
      ev.withColumn("ts", expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))
        .write.parquet(path)
    },
    // current driver fixture: timestamp[us] isAdjustedToUTC=false
    "timestamp_ntz" -> stage("ntz") { (ev, path) =>
      ev.withColumn("ts", col("ts").cast(TimestampNTZType)).write.parquet(path)
    },
    // plain UTC instant (what ScaleGen writes)
    "timestamp_utc" -> stage("utc") { (ev, path) =>
      ev.write.parquet(path)
    })

  test("Tables.events normalizes every ts encoding to TimestampType with identical micros") {
    val base = Tables.events(spark, sf)
      .agg(expr("sum(unix_micros(ts))"), expr("count(*)")).first()
    for ((name, dir) <- encodings) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$name: ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
      val got = ev.agg(expr("sum(unix_micros(ts))"), expr("count(*)")).first()
      assert(got == base, s"$name: micros differ from fixture: $got vs $base")
    }
  }

  test("ts-consuming queries analyze and agree across all encodings (the r7 silent break)") {
    // the exact two queries the r7 NTZ fixture change silently dropped
    for (q <- Seq("gossip_health", "window_range_frame")) {
      val run = SparkEntry.queries(q)
      val base = run(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(base.nonEmpty, s"$q returned no rows on the fixture")
      for ((name, dir) <- encodings) {
        val got = run(spark, dir).collect().map(_.toString).sorted.toSeq
        assert(got == base, s"$q: $name encoding diverges from fixture")
      }
    }
  }

  test("streaming reader normalizes whatever encoding lands (batch==stream rows)") {
    import org.apache.spark.sql.streaming.OutputMode
    for ((name, dir) <- encodings) {
      val batch = graft.streaming.EventStreams
        .readEventsBatch(spark, s"$dir/events.parquet")
      assert(batch.schema("ts").dataType == TimestampType, name)
      // stream the same file through the inferred-schema reader; count
      // rows with a real event-time operation so ts participates
      val landing = java.nio.file.Files.createTempDirectory(s"graftsl_$name")
      java.nio.file.Files.createSymbolicLink(
        landing.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val q = graft.streaming.EventStreams
        .readEventsStream(spark, landing.toString)
        .selectExpr("unix_micros(ts) AS us", "event_id")
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(s"enc_$name").start()
      try {
        q.processAllAvailable()
        val got = spark.table(s"enc_$name").agg(expr("sum(us)"), expr("count(*)")).first()
        val want = batch.agg(expr("sum(unix_micros(ts))"), expr("count(*)")).first()
        assert(got == want, s"$name: stream != batch micros")
      } finally q.stop()
    }
  }
}
