package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** The reference's fault-tolerance test battery translated to Spark
  * (FIXTURES.md §3): crash recovery via task retry (test-mr.sh:283-330),
  * and jobcount-style exactly-once accounting (test-mr.sh:200-223).
  * Speculation/timeout themselves are Spark conf (SURVEY.md §4.2) — what
  * we test is that OUR pipelines produce oracle-identical output under
  * injected task failures.
  */
/** JVM-wide crash flags: closures are serialized per task even in local
  * mode, so an AtomicBoolean captured in the closure would be a per-task
  * copy; a static object is shared across tasks and driver in local mode.
  */
object CrashFlags {
  val a = new java.util.concurrent.atomic.AtomicBoolean(false)
  val b = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class FaultToleranceSpec extends SparkSpec {

  /** A map function that crashes the first attempt of one partition —
    * the crash.go analog (mrapps/crash.go:22-34). Spark must retry the
    * task and the job must still produce the nocrash-oracle output.
    */
  test("crash recovery: injected task failure, output equals no-crash oracle") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("source", "text").as[(String, String)]
    def runWc(inject: Boolean): Map[String, String] =
      graft.mr.MapReduce.run(
        spark, docs,
        (name, contents) => {
          if (inject && org.apache.spark.TaskContext.get() != null
            && org.apache.spark.TaskContext.get().partitionId() == 0
            && org.apache.spark.TaskContext.get().attemptNumber() == 0
            && CrashFlags.a.compareAndSet(false, true)) {
            throw new RuntimeException("injected crash (mrapps/crash.go analog)")
          }
          graft.apps.MrApps.wcMap(name, contents)
        },
        graft.apps.MrApps.wcReduce, 4)
        .collect().map(kv => kv.key -> kv.value).toMap
    val oracle = runWc(inject = false)
    val withCrash = runWc(inject = true)
    assert(CrashFlags.a.get(), "fault injector never fired")
    assert(withCrash === oracle, "output diverged after task retry")
  }

  /** jobcount analog: every input row is processed exactly once as far as
    * the committed result is concerned. We count map-side invocations
    * with an accumulator (they may exceed row count under retries —
    * that's at-least-once execution) and assert the OUTPUT reflects each
    * row exactly once (exactly-once commit, O7).
    */
  test("jobcount: committed output counts each input exactly once despite retries") {
    import spark.implicits._
    val acc: LongAccumulator = spark.sparkContext.longAccumulator("mapCalls")
    val docs = Tables.documents(spark, sf).select("source", "text").as[(String, String)]
    val out = graft.mr.MapReduce.run(
      spark, docs,
      (name, _) => {
        acc.add(1)
        if (org.apache.spark.TaskContext.get() != null
          && org.apache.spark.TaskContext.get().attemptNumber() == 0
          && org.apache.spark.TaskContext.get().partitionId() == 0
          && CrashFlags.b.compareAndSet(false, true)) {
          throw new RuntimeException("injected crash")
        }
        Iterator.single(graft.mr.KeyValue(name, "1"))
      },
      (_, vs) => vs.size.toString, 4)
      .collect().map(kv => kv.key -> kv.value.toLong).toMap
    val want = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === want, "committed counts must reflect each row exactly once")
    // retries imply at-least-once map-side execution
    assert(acc.value >= Tables.documents(spark, sf).count())
  }

  /** mtiming analog: the job actually runs tasks concurrently. */
  test("parallelism: wc runs >1 concurrent task (mtiming analog)") {
    assert(spark.sparkContext.defaultParallelism > 1)
    val n = spark.sparkContext.parallelize(1 to 8, 8).map { _ =>
      Thread.sleep(200)
      org.apache.spark.TaskContext.get().partitionId()
    }.collect().distinct.length
    assert(n == 8)
  }
}
