package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame

/** Ckpt.cachedCheckpoint — the self-healing cross-query checkpoint
  * memo. The failure it exists for: a memoized localCheckpoint's blocks
  * die after the fitting query finishes (executor cascade, or Verify's
  * inter-query unpersist hygiene), and since a localCheckpoint has no
  * lineage, every later consumer of the stale memo fails with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — observed live at the sf10
  * multi-process gate (the prefix-jaccard executor massacre poisoned
  * mixture_sample minutes later). The memo must refit instead.
  */
class CkptSpec extends SparkSpec {
  import spark.implicits._

  private def fitFrame(mark: java.util.concurrent.atomic.AtomicInteger): DataFrame = {
    mark.incrementAndGet()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
  }

  test("cachedCheckpoint: hit returns the same checkpointed frame, no refit") {
    val cache = TrieMap.empty[String, DataFrame]
    val fits = new java.util.concurrent.atomic.AtomicInteger
    val first = Ckpt.cachedCheckpoint(cache, "d1")(fitFrame(fits))
    val second = Ckpt.cachedCheckpoint(cache, "d1")(fitFrame(fits))
    assert(fits.get() == 1, "second call must reuse the memo")
    assert(second eq first, "hit must return the cached instance")
    assert(second.count() == 3)
  }

  test("cachedCheckpoint: dead checkpoint blocks trigger a refit, not a poison") {
    val cache = TrieMap.empty[String, DataFrame]
    val fits = new java.util.concurrent.atomic.AtomicInteger
    val first = Ckpt.cachedCheckpoint(cache, "d2")(fitFrame(fits))
    assert(first.count() == 3)
    // kill the checkpoint the way Verify's hygiene (or an executor
    // cascade) does: unpersist the truncated-lineage RDD's blocks
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val healed = Ckpt.cachedCheckpoint(cache, "d2")(fitFrame(fits))
    assert(fits.get() == 2, "dead blocks must force a refit")
    assert(healed.count() == 3, "the refitted frame must evaluate")
    // and the healed frame is re-memoized: a third call reuses it
    val third = Ckpt.cachedCheckpoint(cache, "d2")(fitFrame(fits))
    assert(fits.get() == 2)
    assert(third eq healed)
  }

  test("cut is the catalog lineage cut: materialized, truncated, value-preserving") {
    import spark.implicits._
    val src = Seq((1L, "a"), (2L, null: String), (3L, "c")).toDF("k", "v")
    val cut = Ckpt.cut(src)
    // lineage is gone (a localCheckpoint leaf), values are intact
    assert(cut.rdd.toDebugString.contains("CheckpointRDD") ||
      cut.queryExecution.analyzed.toString.contains("LogicalRDD"))
    assert(cut.orderBy("k").collect().toSeq == src.orderBy("k").collect().toSeq)
  }

  test("RowHash: order-independent, null-safe, and value-sensitive") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, null: String), (3L, "z")).toDF("k", "v")
    val shuffled = Seq((3L, "z"), (1L, "x"), (2L, null: String)).toDF("k", "v")
    assert(RowHash.of(a) == RowHash.of(shuffled), "row order must not matter")
    val changed = Seq((1L, "x"), (2L, null: String), (3L, "Z")).toDF("k", "v")
    assert(RowHash.of(a) != RowHash.of(changed), "a changed value must change the hash")
    // the NUL sentinel: a LITERAL "null" string is not a null
    val litNull = Seq((2L, "null")).toDF("k", "v")
    val realNull = Seq((2L, null: String)).toDF("k", "v")
    assert(RowHash.of(litNull) != RowHash.of(realNull))
    assert(RowHash.of(spark.emptyDataFrame.withColumn("k",
      org.apache.spark.sql.functions.lit(1L)).filter("k = 2")) == "0")
  }
}
