package graft.gossip

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** One observation of a worker's health. Statuses are ranked
  * Alive(0) < Suspect(1) < Dead(2) and only ever escalate — the
  * monotonicity the reference's table merge enforces
  * (mr/gossip.go:81-104, status escalation at :96-101).
  */
final case class HealthObs(workerId: Long, status: Int, suspicion: Long, lastUpdateMicros: Long)

/** Merged per-worker health state (the gossip health table entry,
  * mr/gossip.go:17-22).
  */
final case class HealthState(status: Int, suspicion: Long, lastUpdateMicros: Long)

/** The reference's gossip health-table merge as a commutative,
  * associative, idempotent-under-escalation keyed aggregate
  * (SURVEY.md §2.1-O14). The RPC fan-out of the reference's protocol is
  * liveness plumbing Spark already has (executor heartbeats); what we
  * reproduce is the *data semantics*: per worker, statuses escalate
  * monotonically (max), suspicion accumulates (sum of increments), and
  * recency wins (max lastUpdate). Consensus (mr/gossip.go:243-267):
  * suspicion >= C (=3) forces Dead.
  *
  * Being a typed Aggregator, Spark runs it with map-side partial
  * aggregation — the shuffle carries one buffer per (partition, worker),
  * not one row per observation: exactly the gossip table's constant
  * ~32 B/worker footprint (README.md:330), at cluster scale.
  */
object HealthMerge {
  val ConsensusC = 3

  val aggregator: Aggregator[HealthObs, HealthState, HealthState] =
    new Aggregator[HealthObs, HealthState, HealthState] {
      def zero: HealthState = HealthState(0, 0L, Long.MinValue)
      def reduce(b: HealthState, a: HealthObs): HealthState =
        HealthState(
          math.max(b.status, a.status),
          b.suspicion + a.suspicion,
          math.max(b.lastUpdateMicros, a.lastUpdateMicros))
      def merge(x: HealthState, y: HealthState): HealthState =
        HealthState(
          math.max(x.status, y.status),
          x.suspicion + y.suspicion,
          math.max(x.lastUpdateMicros, y.lastUpdateMicros))
      def finish(r: HealthState): HealthState =
        if (r.suspicion >= ConsensusC) r.copy(status = 2) else r
      def bufferEncoder: Encoder[HealthState] = Encoders.product[HealthState]
      def outputEncoder: Encoder[HealthState] = Encoders.product[HealthState]
    }

  /** events viewed as health observations: worker = user shard; an
    * 'error' event is a suspicion increment at status Suspect(1) — ONLY
    * the C=3 consensus in finish() can pronounce Dead(2), matching the
    * reference where individual gossip observations never carry Dead
    * directly (mr/gossip.go:243-267). The rest are Alive beacons.
    */
  def obsFromEvents(spark: SparkSession, d: String): org.apache.spark.sql.Dataset[HealthObs] = {
    import spark.implicits._
    Tables.events(spark, d).select(
      ($"user_id" % 20).as("workerId"),
      when($"event_type" === "error", 1).otherwise(0).as("status"),
      when($"event_type" === "error", 1L).otherwise(0L).as("suspicion"),
      unix_micros($"ts").as("lastUpdateMicros")).as[HealthObs]
  }

  /** Merged health table with consensus marking. */
  def healthTable(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    obsFromEvents(spark, d)
      .groupByKey(_.workerId)
      .agg(aggregator.toColumn)
      .map { case (id, st) => (id, st.status.toLong, st.suspicion, st.lastUpdateMicros) }
      .toDF("worker_id", "status", "suspicion", "micros")
      .select($"worker_id", $"status", $"suspicion",
        timestamp_micros($"micros").as("last_update"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gossip_health" -> (healthTable _))

  val oracles: Map[String, String] = Map(
    "gossip_health" ->
      """SELECT worker_id,
        |  CAST(CASE WHEN susp >= 3 THEN 2 ELSE max_status END AS BIGINT) AS status,
        |  susp AS suspicion,
        |  last_update
        |FROM (
        |  SELECT user_id % 20 AS worker_id,
        |    max(CASE event_type WHEN 'error' THEN 1 ELSE 0 END) AS max_status,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS susp,
        |    max(CAST(ts AS TIMESTAMP)) AS last_update
        |  FROM events GROUP BY user_id % 20) t""".stripMargin)
}
