package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Formatted-plan dumper for the optimization-round evidence files
  * (`plans/rNN/<query>_{before,after}.txt`): for each named catalog
  * query, writes `df.explain("formatted")` output (initial plan — with
  * AQE the final plan only exists post-execution; the structural facts
  * the evidence needs, Exchange count / join strategy / PushedFilters /
  * ReadSchema, are all in the initial plan) plus the unpartitioned-
  * window count from the optimized logical plan.
  *
  * Usage: `PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]`
  * → `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val (outDir, suffix, names) = (args(0), args(1),
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val d = if (args.length >= 4) args(3) else "/root/testdata/sf0.1"
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"not in catalog: ${unknown.mkString(",")}")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val qe = SparkEntry.queries(name)(spark, d).queryExecution
      val uw = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.length
      val body = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // count on the simple plan string — FormattedMode splits the
      // operator name from its hashpartitioning arguments
      val nEx = "Exchange hashpartitioning".r
        .findAllIn(qe.executedPlan.toString).length
      Files.write(
        Paths.get(outDir, s"${name}_$suffix.txt"),
        (s"-- $name ($suffix): hash-exchanges=$nEx unpartitioned-windows=$uw" +
          s" sf=$d\n" + body).getBytes(StandardCharsets.UTF_8))
      println(s"PLANDUMP $name ex=$nEx uw=$uw -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
