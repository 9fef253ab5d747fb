package graft

import org.apache.spark.sql.SparkSession

/** Catalog-wide physical-plan census — the tool behind SURVEY §8's
  * shuffle inventory (PlanBudgetSpec enforces the per-query budgets; this
  * main prints the full distribution for the doc). For every catalog
  * query: hash-exchange count, nested-loop-join presence, global-sort
  * presence, plus a histogram and ≤1/≤2 totals.
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir]"` (default sf0.001 —
  * exchange counts are structural, so the smallest sf suffices).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (p, uw) = try {
        val qe = fn(spark, d).queryExecution
        // unpartitioned windows counted on the LOGICAL plan (a tree,
        // traversable under AQE) — each is a single-task global
        // sort-and-fold at ANY scale, so each needs a boundedness
        // adjudication (PlanBudgetSpec enforces the whitelist)
        val u = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.length
        (qe.executedPlan.toString, u)
      } catch { case e: Throwable => (s"ERR ${e.getMessage}", 0) }
      val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
      val nlj = if (p.contains("BroadcastNestedLoopJoin")) 1 else 0
      val sort = if ("Sort \\[[^\\]]*\\], true".r.findAllIn(p).nonEmpty) 1 else 0
      (name, nEx, nlj, sort, uw)
    }
    counts.foreach { case (n, e, j, s, u) =>
      println(s"AUDIT $n ex=$e nlj=$j gsort=$s uw=$u") }
    val h = counts.map(_._2).groupBy(identity).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k->${v.size}" }
    println("AUDIT_HIST " + h.mkString(" "))
    println("AUDIT_TOTAL n=" + counts.size +
      " le1=" + counts.count(_._2 <= 1) + " le2=" + counts.count(_._2 <= 2))
    // catalog-size census (scripts/r10_counts.sh patches README/SURVEY
    // from this line): oracleSql must be read AFTER the construction
    // loop above — the data-fitted oracles (IVF centroids, quantizer
    // bounds, …) register per (session, dir) when their query builds,
    // so a static read undercounts by the fitted tier
    val oracled = SparkEntry.oracleSql.keySet
    println("AUDIT_CATALOG total=" + SparkEntry.queries.size +
      " oracled=" + oracled.size + " no_oracle=" +
      SparkEntry.queries.keySet.diff(oracled).toSeq.sorted.mkString(","))
    spark.stop()
  }
}
