package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Order-sensitive time-series operators. The interesting engineering
  * problem: a sequential recurrence (EWMA) inside a declarative engine,
  * bit-exact across engines.
  *
  * EWMA's fold `acc*(1-α) + x*α` is NOT order-independent, so it cannot
  * be a shuffle-safe aggregate the way sums are. The scalable shape is:
  * group per key (one shuffle), assemble each key's ordered series, fold
  * it serially. Per-key series are bounded (events per user), so the
  * fold is linear work with no driver involvement — and because BOTH
  * engines execute the identical IEEE-double operation sequence, the
  * result is bit-identical with no rounding bridge needed (we round
  * anyway, defensively).
  *
  * At 100 TB: one shuffle on user_id; state per task = one series at a
  * time. For UNBOUNDED per-key series (years of ticks), swap the
  * collect_list fold for the streaming twin — `mapGroupsWithState` with
  * the running EWMA as constant-size state ([[graft.kv.KVStore]]'s
  * pattern) — same recurrence, O(1) memory.
  *
  * Reference basis: nothing order-sensitive exists in the reference —
  * its reduce folds an UNORDERED value list (mr/worker.go:128-148);
  * sorted-within-partition output (O5) is presentation, not semantics.
  */
object TimeSeries {

  /** Smoothing factor: s_i = s_{i-1}*(1-Alpha) + x_i*Alpha. */
  val Alpha = 0.3

  /** Per-user EWMA of event values, events ordered by (ts, event_id):
    * (user_id, n_events, last value, final EWMA). Seed = first value.
    */
  def ewmaUserValue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sort_array(collect_list(struct($"ts", $"event_id", $"value"))).as("evs"))
      .select(
        $"user_id",
        $"n_events",
        $"evs"(size($"evs") - 1)("value").as("last_value"),
        round(
          aggregate(
            expr("slice(evs, 2, size(evs) - 1)"),
            $"evs"(0)("value"),
            (acc, e) => acc * (1 - Alpha) + e("value") * Alpha),
          6).as("ewma"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ewma_user_value" -> (ewmaUserValue _))

  val oracles: Map[String, String] = Map(
    "ewma_user_value" ->
      s"""SELECT user_id, count(*) AS n_events,
         |  last(value ORDER BY ts, event_id) AS last_value,
         |  round(list_reduce(list(value ORDER BY ts, event_id),
         |                    (acc, x) -> acc * ${1 - Alpha} + x * $Alpha), 6) AS ewma
         |FROM events GROUP BY user_id""".stripMargin)
}
