package graft

import graft.relational.Analytics
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Positional multi-touch attribution semantics on planted paths:
  * next-purchase binding, lookback-window exclusion, the exact integer
  * credit schedules (linear and U-shaped), and credit conservation
  * (per-path sums hit 1e6 minus only the documented floor remainder).
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:$minute%02d:00")
  private def tsDaysBefore(days: Int): Timestamp =
    Timestamp.valueOf(s"2024-02-${29 - days} 10:00:00")

  private def run(rows: Seq[(Long, Timestamp, Long, String)]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graftattr")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Analytics.attributionMultitouch(spark, tmp.toString)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  test("3-touch path: exact linear thirds and 40/20/40 U-shape") {
    val got = run(Seq(
      (1L, ts(1), 7L, "view"), (2L, ts(2), 7L, "click"),
      (3L, ts(3), 7L, "signup"), (4L, ts(4), 7L, "purchase")))
    // linear: 1000000 div 3 = 333333 per touch (remainder dropped)
    // ushape: first 400000, middle 200000 div 1, last 400000
    assert(got("view") == (1L, 1L, 333333L, 400000L))
    assert(got("click") == (1L, 1L, 333333L, 200000L))
    assert(got("signup") == (1L, 1L, 333333L, 400000L))
  }

  test("degenerate paths: n=1 takes all, n=2 splits 50/50") {
    val got = run(Seq(
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "purchase"),
      (3L, ts(1), 2L, "view"), (4L, ts(2), 2L, "signup"),
      (5L, ts(3), 2L, "purchase")))
    assert(got("click") == (1L, 1L, 1000000L, 1000000L))
    assert(got("view") == (1L, 1L, 500000L, 500000L))
    assert(got("signup") == (1L, 1L, 500000L, 500000L))
  }

  test("binding: touches attach to the NEXT purchase; trailing touches drop") {
    val got = run(Seq(
      (1L, ts(1), 3L, "click"), (2L, ts(2), 3L, "purchase"),
      (3L, ts(3), 3L, "view"), (4L, ts(4), 3L, "purchase"),
      (5L, ts(5), 3L, "signup"))) // no later purchase -> unattributed
    assert(got("click") == (1L, 1L, 1000000L, 1000000L)) // to purchase 2
    assert(got("view") == (1L, 1L, 1000000L, 1000000L))  // to purchase 4
    assert(!got.contains("signup"))
  }

  test("lookback window: a touch older than 7 days earns nothing") {
    val got = run(Seq(
      (1L, tsDaysBefore(8), 4L, "click"), // 8+ days before the purchase
      (2L, ts(0), 4L, "view"),
      (3L, ts(1), 4L, "purchase")))
    assert(!got.contains("click"))
    assert(got("view") == (1L, 1L, 1000000L, 1000000L))
  }

  private def runFunnel(rows: Seq[(Long, Timestamp, Long, String)]) = {
    val tmp = java.nio.file.Files.createTempDirectory("graftfun")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Analytics.funnelWindowDepth(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("funnel: in-order completion within the hour scores depth 3") {
    val got = runFunnel(Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "click"),
      (3L, ts(20), 1L, "purchase")))
    assert(got == Map(3L -> 1L))
  }

  test("funnel: order violations and deadline misses stop the chain") {
    val got = runFunnel(Seq(
      // user 2: purchase BEFORE click -> sequence broken at depth 2
      (1L, ts(0), 2L, "view"), (2L, ts(5), 2L, "purchase"),
      (3L, ts(10), 2L, "click"),
      // user 3: click only 90 min after the view -> depth 1
      (4L, Timestamp.valueOf("2024-03-01 10:00:00"), 3L, "view"),
      (5L, Timestamp.valueOf("2024-03-01 11:30:00"), 3L, "click"),
      (6L, Timestamp.valueOf("2024-03-01 11:31:00"), 3L, "purchase"),
      // user 4: purchase lands 90 min after the anchoring view -> depth 2
      (7L, Timestamp.valueOf("2024-03-02 10:00:00"), 4L, "view"),
      (8L, Timestamp.valueOf("2024-03-02 10:30:00"), 4L, "click"),
      (9L, Timestamp.valueOf("2024-03-02 11:30:00"), 4L, "purchase")))
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("funnel: per-user depth is the max over anchoring views") {
    val got = runFunnel(Seq(
      (1L, ts(0), 5L, "view"),                       // dies at depth 1
      (2L, Timestamp.valueOf("2024-03-01 12:00:00"), 5L, "view"),
      (3L, Timestamp.valueOf("2024-03-01 12:05:00"), 5L, "click"),
      (4L, Timestamp.valueOf("2024-03-01 12:10:00"), 5L, "purchase")))
    assert(got == Map(3L -> 1L))
  }

  test("funnel: greedy earliest-click is optimal (later click would miss)") {
    // click A at +5min (purchase at +50min: in window);
    // click B at +55min whose next purchase is the same one (before B!) —
    // only the earliest click completes the chain
    val got = runFunnel(Seq(
      (1L, ts(0), 6L, "view"), (2L, ts(5), 6L, "click"),
      (3L, ts(50), 6L, "purchase"), (4L, ts(55), 6L, "click")))
    assert(got == Map(3L -> 1L))
  }

  test("conservation: per-path credit sums differ from 1e6 only by floor remainder") {
    // a 5-touch path: linear 200000 x 5 = exactly 1e6;
    // ushape 400000 + 66666*3 + 400000 = 999998 (remainder 2 dropped)
    val got = run(Seq(
      (1L, ts(1), 5L, "view"), (2L, ts(2), 5L, "click"),
      (3L, ts(3), 5L, "view"), (4L, ts(4), 5L, "click"),
      (5L, ts(5), 5L, "signup"), (6L, ts(6), 5L, "purchase")))
    val linear = got.values.map(_._3).sum
    val ushape = got.values.map(_._4).sum
    assert(linear == 1000000L)
    assert(ushape == 400000L + 3 * 66666L + 400000L)
  }
}
