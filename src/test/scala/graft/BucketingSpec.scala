package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the 100 TB strategy for repeated fact-fact
  * joins: pre-bucket both tables on the join key so the join needs NO
  * exchange at read time (the scan itself reports the bucket
  * partitioning). This is the persistent-storage analog of the
  * reference's `ihash(key) % NReduce` intermediate files.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans without any shuffle exchange") {
    // warehouse dir is a temp dir set at session creation (static conf)
    spark.sql("DROP TABLE IF EXISTS o_b")
    spark.sql("DROP TABLE IF EXISTS l_b")
    // disable auto-broadcast so the test proves bucketing, not broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_b")
      Tables.lineitem(spark, sf)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("l_b")
      val joined = spark.table("l_b").join(spark.table("o_b"), "o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinExchanges = "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(plan).length
      assert(joinExchanges == 0, s"bucketed join still shuffles on the key:\n$plan")
      // and it computes the right thing
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.sql("DROP TABLE IF EXISTS l_b")
    }
  }
}
