package graft.gossip

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.Tables

/** One observation of a worker's health. Statuses are ranked
  * Alive(0) < Suspect(1) < Dead(2) (mr/gossip.go:9-15). `suspicion` is
  * the observer's CUMULATIVE SuspicionCount at that moment (the
  * reference gossips whole table entries whose counts only grow locally,
  * mr/gossip.go:60-79), so merging tables by max reproduces the
  * reference's `otherEntry.SuspicionCount > existing.SuspicionCount`
  * propagation (mr/gossip.go:97-102).
  */
final case class HealthObs(workerId: Long, status: Int, suspicion: Long, lastUpdateMicros: Long)

/** Merged per-worker health state (the gossip health table entry,
  * mr/gossip.go:17-22).
  */
final case class HealthState(status: Int, suspicion: Long, lastUpdateMicros: Long)

/** Aggregation buffer: the winning (most recent) observation kept WHOLE
  * as an LWW register, plus the running max suspicion. Keeping the
  * register un-mixed (never overwriting its suspicion with the global
  * max) is what makes the merge associative — a lattice product of an
  * LWW-register and a max-counter.
  */
final case class HealthBuf(status: Int, suspicion: Long, lastUpdateMicros: Long, maxSuspicion: Long)

/** The reference's gossip health-table merge (mr/gossip.go:81-104) as a
  * commutative, associative keyed aggregate (SURVEY.md §2.1-O14). The
  * RPC fan-out of the reference's protocol is liveness plumbing Spark
  * already has (executor heartbeats); what we reproduce is the *data
  * semantics*, and those are RECENCY-WINS: a newer entry replaces the
  * existing one wholesale (mr/gossip.go:90-96), so a worker observed
  * Alive after a Suspect spell RECOVERS — status does not escalate
  * monotonically. Suspicion merges by max (mr/gossip.go:97-99).
  *
  * Two deliberate deltas from the reference, both forced by running the
  * merge as a deterministic parallel aggregate rather than a sequential
  * gossip loop:
  *
  *   - The reference stamps merged entries with local wall-clock `now`
  *     and its tie behavior therefore depends on delivery order. We
  *     order observations by the total order (lastUpdateMicros,
  *     suspicion, status) — same winner for any merge tree.
  *   - The reference's "older entry with higher suspicion escalates
  *     Alive→Suspect" side-branch (mr/gossip.go:99-101) is inherently
  *     order-dependent; we keep the max suspicion (no information lost)
  *     and let the consensus rule decide. With cumulative per-worker
  *     suspicion feeds the newest observation already carries the max,
  *     so the two formulations coincide on our inputs.
  *
  * Consensus (mr/gossip.go:243-267): an entry currently Suspect-or-worse
  * whose count reached C (=3) is pronounced Dead. An entry whose latest
  * observation is Alive is NOT (checkSuspicions only considers
  * Suspect/Dead entries) — recoverability again.
  *
  * Being a typed Aggregator, Spark runs it with map-side partial
  * aggregation — the shuffle carries one buffer per (partition, worker),
  * not one row per observation: exactly the gossip table's constant
  * ~32 B/worker footprint (README.md:330), at cluster scale.
  */
object HealthMerge {
  val ConsensusC = 3

  /** Total order on observations: newest wins; ties broken by suspicion
    * then status so any merge order picks the same register.
    */
  private def newerThan(aTs: Long, aSusp: Long, aSt: Int,
                        bTs: Long, bSusp: Long, bSt: Int): Boolean =
    aTs > bTs || (aTs == bTs && (aSusp > bSusp || (aSusp == bSusp && aSt > bSt)))

  val aggregator: Aggregator[HealthObs, HealthBuf, HealthState] =
    new Aggregator[HealthObs, HealthBuf, HealthState] {
      def zero: HealthBuf = HealthBuf(0, 0L, Long.MinValue, 0L)
      def reduce(b: HealthBuf, a: HealthObs): HealthBuf = {
        val reg =
          if (newerThan(a.lastUpdateMicros, a.suspicion, a.status,
                        b.lastUpdateMicros, b.suspicion, b.status))
            (a.status, a.suspicion, a.lastUpdateMicros)
          else (b.status, b.suspicion, b.lastUpdateMicros)
        HealthBuf(reg._1, reg._2, reg._3, math.max(b.maxSuspicion, a.suspicion))
      }
      def merge(x: HealthBuf, y: HealthBuf): HealthBuf = {
        val reg =
          if (newerThan(x.lastUpdateMicros, x.suspicion, x.status,
                        y.lastUpdateMicros, y.suspicion, y.status)) x
          else y
        HealthBuf(reg.status, reg.suspicion, reg.lastUpdateMicros,
          math.max(x.maxSuspicion, y.maxSuspicion))
      }
      def finish(r: HealthBuf): HealthState = {
        val status =
          if (r.status >= 1 && r.maxSuspicion >= ConsensusC) 2 else r.status
        HealthState(status, r.maxSuspicion, r.lastUpdateMicros)
      }
      def bufferEncoder: Encoder[HealthBuf] = Encoders.product[HealthBuf]
      def outputEncoder: Encoder[HealthState] = Encoders.product[HealthState]
    }

  /** events viewed as health observations: worker = user shard; an
    * 'error' event is a Suspect observation and bumps the worker's
    * cumulative suspicion count (a running count over event order — the
    * observer's local monotone counter, mr/gossip.go:60-79); the rest
    * are Alive beacons. Only the C=3 consensus in finish() can pronounce
    * Dead(2), matching the reference where gossip observations never
    * carry Dead directly.
    */
  def obsFromEvents(spark: SparkSession, d: String): org.apache.spark.sql.Dataset[HealthObs] = {
    import spark.implicits._
    val w = Window.partitionBy($"workerId").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .select(($"user_id" % 20).as("workerId"), $"event_type", $"ts", $"event_id")
      .withColumn("suspicion",
        sum(when($"event_type" === "error", 1L).otherwise(0L)).over(w))
      .select(
        $"workerId",
        when($"event_type" === "error", 1).otherwise(0).as("status"),
        $"suspicion",
        unix_micros($"ts").as("lastUpdateMicros")).as[HealthObs]
  }

  /** Merged health table with consensus marking. The running-suspicion
    * window and the merge aggregate both hash-partition on workerId, so
    * Spark reuses one exchange for the two steps — a single shuffle end
    * to end at any scale.
    */
  def healthTable(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val merge = udaf(aggregator, Encoders.product[HealthObs])
    obsFromEvents(spark, d)
      .groupBy($"workerId")
      .agg(merge($"workerId", $"status", $"suspicion", $"lastUpdateMicros").as("st"))
      .select($"workerId".as("worker_id"),
        $"st.status".cast("long").as("status"),
        $"st.suspicion".as("suspicion"),
        timestamp_micros($"st.lastUpdateMicros").as("last_update"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gossip_health" -> (healthTable _))

  val oracles: Map[String, String] = Map(
    "gossip_health" ->
      """WITH obs AS (
        |  SELECT user_id % 20 AS worker_id,
        |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS status,
        |         CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
        |              OVER (PARTITION BY user_id % 20
        |                    ORDER BY ts, event_id) AS BIGINT) AS susp,
        |         CAST(ts AS TIMESTAMP) AS t
        |  FROM events),
        |ranked AS (
        |  SELECT worker_id, status, susp, t,
        |         row_number() OVER (PARTITION BY worker_id
        |                            ORDER BY t DESC, susp DESC, status DESC) AS rn,
        |         max(susp) OVER (PARTITION BY worker_id) AS max_susp,
        |         max(t) OVER (PARTITION BY worker_id) AS last_update
        |  FROM obs)
        |SELECT worker_id,
        |       CAST(CASE WHEN status >= 1 AND max_susp >= 3
        |            THEN 2 ELSE status END AS BIGINT) AS status,
        |       max_susp AS suspicion,
        |       last_update
        |FROM ranked WHERE rn = 1""".stripMargin)
}
