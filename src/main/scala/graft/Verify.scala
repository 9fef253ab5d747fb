package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg (local iteration only; driver passes 2): run just
    // these comma-separated query names and dump only their oracle SQL.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same overrides as Bench: the multi-JVM rehearsal hash-checks a
    // catalog subset on local-cluster (executors need the class
    // snapshot on their own classpath)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // shuffle partitions default to the core count (fixture scale) but
    // must SCALE WITH VOLUME on the 100x rehearsals: per-task agg/sort
    // state divides across reduce partitions (the r8 sf3 lever sweep),
    // and the multi-process sf10 runs OOM'd 12 GB executors at 32
    // partitions (basket_rules' pair partials) — 256 holds per-task
    // state at the sf0.1 design point while AQE re-coalesces the small
    // queries' outputs
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shuffleParts)
    sys.env.get("SPARK_GRAFT_EXECUTOR_CP").foreach(cp =>
      builder.config("spark.executor.extraClassPath", cp))
    // generic conf passthrough (semicolon-separated k=v): the executor-kill
    // rehearsal pins spark.task.maxFailures explicitly so the artifact
    // records the retry budget the run survived under
    GraftEnv.applyExtraConf(builder)
    GraftEnv.requireExecutorMemoryOnCluster(master)
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Resume-from-manifest (SPARK_GRAFT_RESUME=1): skip queries whose
    // output dir already carries parquet's _SUCCESS marker — the
    // reference's coordinator checkpoint (mr-state.json, a bitmap of
    // completed tasks consulted on restart) re-expressed with the
    // filesystem as the manifest. Parquet commits _SUCCESS LAST via a
    // rename, so a driver killed mid-write leaves no marker and the
    // query re-runs whole on restart: at-least-once per query,
    // exactly-once per committed dir. Default off: a normal gate run
    // must never silently reuse a stale dump.
    val resume = sys.env.get("SPARK_GRAFT_RESUME").contains("1")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_(name)) }
      .filter { case (name, _) =>
        val done = resume && Files.exists(Paths.get(s"$outDir/$name/_SUCCESS"))
        if (done) System.err.println(s"[verify] $name already committed — skipped")
        !done
      }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // Session hygiene between queries: every persisted RDD still
        // alive here is THIS query's debris (queries share nothing) —
        // mostly replicated localCheckpoint blocks, which otherwise
        // linger on executors until the ContextCleaner's weak refs are
        // GC'd. On multi-process sf10 sessions that lag compounded into
        // executor heap exhaustion ~250 queries in (three r12 gate
        // attempts died of it); explicit unpersist makes cleanup
        // deterministic instead of GC-timed.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
