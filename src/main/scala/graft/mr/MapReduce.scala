package graft.mr

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** The reference's single datum: an untyped string key-value pair
  * (reference: mr/worker.go:18-21). Typed apps should prefer a real
  * `Dataset[T]`; this exists to reproduce the reference's programming
  * model exactly.
  */
final case class KeyValue(key: String, value: String)

/** Generic MapReduce engine core — the reference's programming model
  * (user-pluggable Map/Reduce pair, reference: mr/worker.go:33-157,
  * main/mrworker.go:34-51) re-expressed as a ~40-line Spark library.
  *
  * Architecture notes (100 TB mindset):
  *   - ONE shuffle: `repartition(n, key)` is the exact analog of the
  *     reference's `ihash(key) % NReduce` bucket routing
  *     (mr/worker.go:25-29,79). Spark's Exchange is the stage barrier the
  *     reference implements by hand (mr/coordinator.go:76-78).
  *   - Sort-based reduce: `sortWithinPartitions(key)` + a streaming
  *     grouped fold in `mapPartitions` means only ONE key's values are
  *     ever materialized (the reference holds the whole partition in RAM,
  *     mr/worker.go:111-131 — an OOM risk at scale we do not copy).
  *     Output arrives sorted by key within each partition, matching the
  *     reference's sorted `mr-out-R` files (mr/worker.go:133-137).
  *   - Fault tolerance (task retry, speculation, commit atomicity,
  *     barriers) is Spark conf, not code — see SURVEY.md §4.2.
  */
object MapReduce {

  /** Run a full map/shuffle/reduce job.
    *
    * @param input   (name, contents) pairs — the reference's map-input
    *                contract (one whole file per map task, mr/worker.go:57-64)
    * @param mapFn   `Map(name, contents) -> [(k, v)]` (UDTF analog)
    * @param reduceFn `Reduce(key, values) -> value` (UDAF analog); values
    *                arrive in nondeterministic order, like the reference —
    *                apps that need order sort inside reduceFn
    * @param numPartitions the reference's NReduce
    */
  def run(
      spark: SparkSession,
      input: Dataset[(String, String)],
      mapFn: (String, String) => IterableOnce[KeyValue],
      reduceFn: (String, Seq[String]) => String,
      numPartitions: Int): Dataset[KeyValue] = {
    import spark.implicits._
    input
      .flatMap { case (name, contents) => mapFn(name, contents) }
      .repartition(numPartitions, col("key"))
      .sortWithinPartitions(col("key"))
      .mapPartitions { it =>
        // Streaming grouped fold over the key-sorted run: holds one key's
        // values at a time (cf. sequential oracle main/mrsequential.go:70-86).
        new Iterator[KeyValue] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): KeyValue = {
            val key = buf.head.key
            val values = Seq.newBuilder[String]
            while (buf.hasNext && buf.head.key == key) values += buf.next().value
            KeyValue(key, reduceFn(key, values.result()))
          }
        }
      }
  }

  /** Run a submit-time-loaded [[MrApp]] (see [[AppLoader]]) — the
    * reference worker's entry path (`Worker(mapf, reducef)` after
    * `loadPlugin`, main/mrworker.go:28-29).
    */
  def runApp(
      spark: SparkSession,
      input: Dataset[(String, String)],
      app: MrApp,
      numPartitions: Int): Dataset[KeyValue] =
    run(spark, input, app.map, app.reduce, numPartitions)

  /** Incremental variant: reduce expressed as a typed [[Aggregator]], so
    * Spark performs partial (map-side) aggregation before the shuffle —
    * the scalable path the reference lacks (its reduce sees fully
    * materialized value lists, mr/worker.go:128-148).
    */
  def runAgg[B: org.apache.spark.sql.Encoder, O: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      input: Dataset[(String, String)],
      mapFn: (String, String) => IterableOnce[KeyValue],
      agg: Aggregator[KeyValue, B, O]): Dataset[(String, O)] = {
    import spark.implicits._
    input
      .flatMap { case (name, contents) => mapFn(name, contents) }
      .groupByKey(_.key)
      .agg(agg.toColumn)
  }
}

/** Source/sink helpers reproducing the reference's text I/O (O1/O7). */
object TextIO {

  /** Whole-file scan: one (fileName, contents) row per file — the
    * reference's map-input contract (mr/worker.go:57-64).
    */
  def wholeTextFiles(spark: SparkSession, glob: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(glob).toDS()
  }

  /** `"<key> <value>"` text sink (reference output format,
    * mr/worker.go:147). Spark's FileOutputCommitter provides the
    * temp-file + atomic-rename idempotency the reference hand-rolls
    * (mr/worker.go:139-157).
    */
  def writeTextSink(ds: Dataset[KeyValue], path: String): Unit = {
    import ds.sparkSession.implicits._
    ds.map(kv => s"${kv.key} ${kv.value}").write.mode("overwrite").text(path)
  }
}
