import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.text._

object ProfileClusters {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()
    val docs = t("read+cache docs") {
      val x = Tables.documents(spark, d).withColumn("t", TextAnalysis.toks($"text"))
      x.count(); x
    }
    val edges = t("jaccard edges materialize") {
      val e = Dedup.jaccardPairsOf(docs)
        .filter($"jacc" >= DedupCluster.JaccThreshold)
        .select($"doc_a", $"doc_b").coalesce(1).localCheckpoint()
      println("[prof] n_edges = " + e.count()); e
    }
    val cl = t("propagation loop") {
      val c = DedupCluster.clustersOfEdges(edges)
      c.write.mode("overwrite").format("noop").save(); c
    }
    t("full clusters() incl edges") {
      DedupCluster.clusters(spark, d).write.mode("overwrite").format("noop").save()
    }
    t("survivors (memoized)") {
      DedupCluster.survivors(spark, d).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
