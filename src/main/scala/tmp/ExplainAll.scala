import org.apache.spark.sql.SparkSession
object ExplainAll extends App {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4")
    .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val sf = "/root/testdata/sf0.01"
  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    val plan = fn(spark, sf).queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length - "ReusedExchange".r.findAllIn(plan).length
    val nBc = "BroadcastExchange".r.findAllIn(plan).length
    val scans = "Scan parquet".r.findAllIn(plan).length
    val pushed = plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")
    println(f"$name%-25s exchanges=$nEx%2d (bcast=$nBc) scans=$scans%2d pushedFilters=$pushed")
  }
  spark.stop()
}
